"""GPX 1.1 track codec (Topografix GPX — the standard GPS-track XML every
handheld/phone exports; osmio's world is full of GPX traces uploaded to OSM).

Writer emits `<trk><name>…</name><trkseg><trkpt lat=".." lon=".."><time>…
</time></trkpt>…</trkseg></trk>` with the same byte-exact disciplines as the
engine's other text formats: coordinates through the integer-only E7 decimal
renderer (functions/wkt.fmt_e7 — no float formatting), times through the
shared ISO-8601 second format (UTC session, functions/timestamps._ISO_FMT).
Reader recovers (lat7, lon7, epoch) with a regexp/split pipeline.  All JVM
expression code — map-only, zero shuffle, codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmgraft.functions.timestamps import ntz_epoch, ntz_from_epoch
from osmgraft.functions.wkt import fmt_e7, parse_e7

_ISO = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def gpx_trkpt(lat7: Column, lon7: Column, epoch: Column) -> Column:
    """One <trkpt> element: lat/lon attributes + <time> child."""
    return F.concat(
        F.lit('<trkpt lat="'),
        fmt_e7(lat7),
        F.lit('" lon="'),
        fmt_e7(lon7),
        F.lit('"><time>'),
        # naive render (from_unixtime formats through the session timezone)
        F.date_format(ntz_from_epoch(epoch), _ISO),
        F.lit("</time></trkpt>"),
    )


def gpx_trk(name: Column, trkseg_body: Column) -> Column:
    """Wrap an already-ordered trkpt concatenation into <trk>."""
    return F.concat(
        F.lit("<trk><name>"),
        name,
        F.lit("</name><trkseg>"),
        trkseg_body,
        F.lit("</trkseg></trk>"),
    )


def parse_gpx_trkpts(df: DataFrame, gpx_col: str) -> DataFrame:
    """<trk> text → one row per trkpt with (lat7, lon7, epoch) recovered;
    other columns pass through.  Position in the segment is preserved as
    ``pt_idx`` (attribute order inside a trkpt is fixed by the writer; the
    regexps tolerate any inter-element whitespace the writer never emits)."""
    lats = F.regexp_extract_all(F.col(gpx_col), F.lit(r'lat="([^"]+)"'), 1)
    lons = F.regexp_extract_all(F.col(gpx_col), F.lit(r'lon="([^"]+)"'), 1)
    times = F.regexp_extract_all(F.col(gpx_col), F.lit(r"<time>([^<]+)</time>"), 1)
    z = F.arrays_zip(lats.alias("la"), lons.alias("lo"), times.alias("tm"))
    ex = df.select("*", F.posexplode(z).alias("pt_idx", "_pt"))
    return ex.select(
        "*",
        parse_e7(F.col("_pt")["la"]).alias("lat7"),
        parse_e7(F.col("_pt")["lo"]).alias("lon7"),
        # to_timestamp_ntz + naive arithmetic, NOT unix_timestamp(to_timestamp):
        # the with-zone parse arm shifts by the session offset under a
        # non-UTC session (r5 tz probe; functions/timestamps.ntz_epoch)
        ntz_epoch(F.to_timestamp_ntz(F.col("_pt")["tm"], F.lit(_ISO)))
        .cast("long")
        .alias("epoch"),
    ).drop("_pt")
