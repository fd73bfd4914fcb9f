"""Relational + spatial operators (SURVEY.md §2.3-2.6): broadcast PIP join,
salted cell equi-join with explicit skew split, kNN via ring expansion,
tag/aggregation helpers, dedup and similarity ops."""
