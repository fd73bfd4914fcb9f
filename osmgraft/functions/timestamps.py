"""F5: cross-format timestamp comparison (osmio lib.rs:296-313).

The reference models a timestamp as either an ISO-8601 string or an epoch
number (``TimestampFormat``); ``PartialOrd``/``PartialEq`` compare two
same-format values directly (ISO strings lexically — RFC3339 'Z' strings
order lexicographically iff chronologically) and MIXED formats by converting
both to epoch seconds. These Column builders reproduce that contract as pure
JVM expressions (whole-stage codegen, no UDFs).

Formats: ``'iso'`` (RFC3339 ``yyyy-MM-ddTHH:mm:ssZ`` string column) and
``'epoch'`` (integral seconds column).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def ntz_epoch(col: Column) -> Column:
    """Naive epoch seconds of a TIMESTAMP_NTZ column, SESSION-TIMEZONE-FREE:
    integer date-diff days ×86400 plus the naive clock fields. The r5 tz
    probe showed `unix_timestamp(to_timestamp(iso))` shifts by the session
    offset under a non-UTC session (the parse arm goes through TIMESTAMP
    with-zone), flipping ts_cross_format_cmp — this form is identical to
    the unix_timestamp value under UTC and invariant everywhere else."""
    return (
        F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(col) * 3600
        + F.minute(col) * 60
        + F.second(col)
    )


def ntz_micros(col: Column) -> Column:
    """Naive epoch MICROSECONDS of a TIMESTAMP_NTZ column, session-tz-free —
    the drop-in for ``unix_micros(col.cast('timestamp'))``, whose NTZ→TZ
    cast applies the session offset (r5 tz probe: scd2/sessionize flipped
    under a non-UTC session). The sub-second part rides a naive
    date_format, so no with-zone value is ever formed."""
    return ntz_epoch(col) * 1_000_000 + F.date_format(col, "SSSSSS").cast("long")


def ntz_from_epoch(sec: Column) -> Column:
    """TIMESTAMP_NTZ from integral epoch seconds, session-tz-free — the
    drop-in for ``timestamp_seconds()``/``from_unixtime()``, which build a
    with-zone instant that then RENDERS through the session timezone (r5 tz
    probe: the XML/OPL/GPX writers flipped under a non-UTC session)."""
    return F.timestamp_add(
        "SECOND", sec.cast("long"), F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    )


def ts_to_epoch(col: Column, fmt: str) -> Column:
    """Epoch seconds (long) from either representation — the reference's
    ``to_epoch_number`` (lib.rs:276-283)."""
    if fmt == "epoch":
        return col.cast("long")
    if fmt == "iso":
        return ntz_epoch(F.to_timestamp_ntz(col, F.lit(_ISO_FMT))).cast("long")
    raise ValueError(f"unknown timestamp format {fmt!r}")


def ts_compare(a: Column, a_fmt: str, b: Column, b_fmt: str) -> Column:
    """-1 / 0 / 1 ordering column. Same-format pairs compare natively (ISO
    lexically, epoch numerically) exactly like the reference's per-variant
    arms; mixed-format pairs compare through epoch seconds (lib.rs:296-313).
    NULL in either operand yields NULL (the reference's partial_cmp None)."""
    if a_fmt == b_fmt:
        lhs, rhs = a, b
    else:
        lhs, rhs = ts_to_epoch(a, a_fmt), ts_to_epoch(b, b_fmt)
    return (
        F.when(lhs.isNull() | rhs.isNull(), F.lit(None).cast("int"))
        .when(lhs < rhs, F.lit(-1))
        .when(lhs > rhs, F.lit(1))
        .otherwise(F.lit(0))
    )


def ts_equal(a: Column, a_fmt: str, b: Column, b_fmt: str) -> Column:
    """Cross-format equality — the reference's ``PartialEq`` (lib.rs:305-313)."""
    return ts_compare(a, a_fmt, b, b_fmt) == 0
