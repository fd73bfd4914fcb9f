"""WKT (Well-Known Text, OGC Simple Features / ISO 19125) polygon codec.

Rounds out the vector-format family next to GeoJSON, polyline, and MVT
(osmio itself is a format engine — XML/OPL/PBF readers+writers; WKT is the
interchange text format every OGC tool speaks).  Coordinates are the
engine's fixed-point E7 integers rendered as exact decimal-degree text
("-150.0000000"), built and parsed with INTEGER arithmetic only — no float
formatting anywhere, so the byte-exact string is reproducible across
engines and partitionings (north-rule bitwise requirement).

Everything is JVM expression code (whole-stage codegen): the writer is a
``transform``/``concat_ws`` fold over the ring arrays, the parser a
``regexp``/``split`` pipeline back to the same ``array<struct<lat7,lon7>>``
shape.  Map-only — zero shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_E7 = 10_000_000


def fmt_e7(c: Column) -> Column:
    """E7 int → exact decimal-degree text, integer math only.

    abs(c) is split with div/mod; the div operates on an exact multiple of
    1e7 (both ≤ 1.8e9, inside double exactness) so the cast can't mis-floor.
    """
    a = F.abs(c.cast("long"))
    ipart = ((a - a % _E7) / _E7).cast("long")
    return F.concat(
        F.when(c < 0, F.lit("-")).otherwise(F.lit("")),
        ipart.cast("string"),
        F.lit("."),
        F.lpad((a % _E7).cast("string"), 7, "0"),
    )


def parse_e7(txt: Column) -> Column:
    """Exact inverse of :func:`fmt_e7` ("-150.0000000" → -1500000000)."""
    neg = txt.startswith("-")
    body = F.when(neg, F.substring(txt, 2, 32)).otherwise(txt)
    ipart = F.split(body, "\\.").getItem(0).cast("long")
    frac = F.rpad(F.coalesce(F.split(body, "\\.").getItem(1), F.lit("")), 7, "0").cast(
        "long"
    )
    mag = ipart * _E7 + frac
    return F.when(neg, -mag).otherwise(mag).cast("int")


def _ring_text(ring: Column) -> Column:
    """array<struct<lat7,lon7>> → "lon lat, lon lat, ..." (WKT x=lon y=lat)."""
    return F.concat_ws(
        ", ",
        F.transform(
            ring,
            lambda p: F.concat(fmt_e7(p["lon7"]), F.lit(" "), fmt_e7(p["lat7"])),
        ),
    )


def wkt_polygon(ring: Column, holes: Column) -> Column:
    """POLYGON ((outer), (hole), ...) — rings must be closed (fixture
    contract: first == last vertex); hole order preserved."""
    ring_txts = F.concat(
        F.array(_ring_text(ring)), F.transform(holes, _ring_text)
    )
    return F.concat(
        F.lit("POLYGON ("),
        F.concat_ws(", ", F.transform(ring_txts, lambda t: F.concat(F.lit("("), t, F.lit(")")))),
        F.lit(")"),
    )


def parse_wkt_polygon(wkt: Column) -> Column:
    """POLYGON text → array of rings (array<array<struct<lat7,lon7>>>);
    element 0 is the outer ring, the rest are holes."""
    inner = F.regexp_extract(wkt, r"^POLYGON \(\((.*)\)\)$", 1)
    rings = F.split(inner, r"\), \(")
    return F.transform(
        rings,
        lambda r: F.transform(
            F.split(r, ", "),
            lambda pt: F.struct(
                parse_e7(F.split(pt, " ").getItem(1)).alias("lat7"),
                parse_e7(F.split(pt, " ").getItem(0)).alias("lon7"),
            ),
        ),
    )


def sql_fmt_e7(c: str) -> str:
    """DuckDB twin of fmt_e7 — same integer div/mod/lpad construction."""
    return (
        f"(CASE WHEN {c} < 0 THEN '-' ELSE '' END || "
        f"CAST(abs(CAST({c} AS BIGINT)) // {_E7} AS VARCHAR) || '.' || "
        f"lpad(CAST(abs(CAST({c} AS BIGINT)) % {_E7} AS VARCHAR), 7, '0'))"
    )
