"""Scalar function kernels (SURVEY.md §2.8): coordinate codec, tile math,
timestamp formatting, XML/OPL escaping, tag helpers."""
