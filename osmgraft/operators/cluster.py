"""Z-order clustered writes — spatial data layout for scan pruning.

At 100 TB the scan is the query: parquet readers prune files and row groups
by min/max column statistics, but a spatially RANDOM layout makes every
file's (tx, ty) span the whole world, so a small-region query still touches
every file. Writing in Morton (Z-order) gives each file a compact spatial
footprint, so bounding-box predicates prune to O(region) files — the same
layout Iceberg/Delta expose as ``zorder by``, built here from primitives:
interleave the tile bits (the geohash module's mask/shift spreader),
range-repartition on the key (Spark samples quantiles → balanced files),
sort within partitions, drop the key before writing.

The footprint claim is MEASURED, not asserted: tests read the written
parquet footers (row-group min/max of tx/ty) and check that a tile-box
predicate intersects a small fraction of row groups under Z-order vs ~all
of them under a hash layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmgraft.functions.geohash import morton_col


def zorder_key(x: Column, y: Column) -> Column:
    """Morton interleave of two non-negative int columns (x even bits) —
    one shared spreader (geohash.morton_col) serves geohash, quadkey, and
    Z-order so a bit-width fix lands everywhere at once."""
    return morton_col(x, y)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered in Z-order on (x_col, y_col).

    repartitionByRange samples the key distribution, so files are balanced
    even when the data is spatially skewed (a fixed grid split would put a
    city in one file and an ocean in fifty)."""
    keyed = df.withColumn("_z", zorder_key(F.col(x_col), F.col(y_col)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_spans(path: str, x_col: str, y_col: str) -> list[tuple]:
    """(x_min, x_max, y_min, y_max) per row group from the parquet footers —
    exactly the statistics a reader prunes with."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index(x_col), names.index(y_col)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx, sy = g.column(xi).statistics, g.column(yi).statistics
            spans.append((sx.min, sx.max, sy.min, sy.max))
    return spans


def pruned_fraction(
    spans: list[tuple], x_lo: int, x_hi: int, y_lo: int, y_hi: int
) -> float:
    """Fraction of row groups a (x, y) box predicate can SKIP by stats."""
    touch = sum(
        1
        for (xmn, xmx, ymn, ymx) in spans
        if not (xmx < x_lo or xmn > x_hi or ymx < y_lo or ymn > y_hi)
    )
    return 1.0 - touch / len(spans)


def hilbert_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    z: int,
    n_files: int = 16,
    keep_key: str | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Hilbert key of
    (x_col, y_col) — same range-repartition + sort discipline as
    zorder_write, tighter file footprints (consecutive Hilbert keys are grid
    neighbors; Morton's diagonal jumps widen row-group min/max boxes).

    ``keep_key`` persists the key as a named column: a one-dimensional sort
    key whose row-group min/max stats are TIGHT INTERVALS (the file is
    sorted on it), which is what hilbert_range_scan's BETWEEN disjunction
    prunes against — 2-D (x, y) stats can't express the curve locality."""
    from osmgraft.functions.hilbert import with_hilbert_key

    keyed = with_hilbert_key(
        df, F.col(x_col), F.col(y_col), z, out=keep_key or "_h"
    )
    clustered = keyed.repartitionByRange(
        n_files, keep_key or "_h"
    ).sortWithinPartitions(keep_key or "_h")
    if not keep_key:
        clustered = clustered.drop("_h")
    clustered.write.mode("overwrite").parquet(path)


def hilbert_range_scan(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    z: int,
    bbox: tuple[int, int, int, int],
    max_ranges: int = 64,
) -> DataFrame:
    """Two-phase bbox scan over a Hilbert-keyed table: (1) an OR-of-BETWEENs
    on the persisted 1-D key (driver-side O(perimeter) decomposition,
    ``hilbert_bbox_ranges``) that Catalyst pushes into the parquet scan, so
    row-group min/max stats on the sort key skip everything outside the
    curve ranges; (2) a residual exact (x, y) bbox predicate that removes
    the false positives ``max_ranges`` coalescing admitted.

    The classic SFC index-scan shape (Hilbert R-tree lineage; e.g. Lawder &
    King, "Querying multi-dimensional data indexed using the Hilbert
    space-filling curve", SIGMOD Record 2001): ranges prune IO, the residual
    refines. At 100 TB the BETWEEN chain is a handful of stats comparisons
    per row group — no Python, no shuffle, no index structure to maintain
    beyond the sorted layout hilbert_write already produces."""
    from osmgraft.functions.hilbert import hilbert_bbox_ranges, hilbert_range_filter

    x0, x1, y0, y1 = bbox
    ranges = hilbert_bbox_ranges(z, x0, x1, y0, y1, max_ranges=max_ranges)
    return df.filter(hilbert_range_filter(F.col(key_col), ranges)).filter(
        F.col(x_col).between(x0, x1) & F.col(y_col).between(y0, y1)
    )


def bucketed_write(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a BUCKETED table (Spark native bucketing: CLUSTERED
    BY keys INTO n_buckets, parquet data source) — the shuffle eliminator
    for repeated equi-joins on a stable key.  Two tables bucketed on the
    same keys with the same bucket count are hash-partitioned identically
    AT WRITE TIME, so a join between them needs NO Exchange on either side
    (and with sort=True, no Sort either): at 100 TB, a fact↔dim or
    fact↔fact join that would shuffle hundreds of TB becomes a per-bucket
    merge — pay one layout write, amortize over every downstream join.
    The complement of the Z-order/Hilbert layouts above (those prune
    SCANS; bucketing co-locates JOINS).

    ``path`` makes the table external (data at path, metadata in the
    session catalog).  Spark's bucket file naming encodes the bucket id —
    readers recover the partitioning from the catalog, not from sampling.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
