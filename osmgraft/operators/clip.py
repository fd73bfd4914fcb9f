"""Segment → tile clipping: exact-integer Liang–Barsky in world-pixel space.

The missing link between way geometry and vector-tile LINE layers: every way
segment, projected once to integer world pixels at zoom z (tile grid ×
EXTENT=4096, the Mapbox Vector Tile convention — the lon/lat→pixel projection
is the already-hash-gated `functions/tiles` map at z+12), is clipped to each
tile window it crosses, emitting tile-local integer pixel endpoints ready for
MVT line encoding (`functions/mvt`).

All math is pure int64 (reference precision model: lib.rs:66-71 fixed-point;
rasterization parity of osmio's node-coordinate fidelity tests):

* directions are sign-normalized (reflect segment AND window) so both deltas
  are >= 0 and every Liang–Barsky parameter is a fraction with a POSITIVE
  denominator — fraction max/min is then overflow-safe cross-multiplication;
* the enter/leave parameters stay exact rationals (num, den); the only
  rounding is the final half-up quantization of the clip point to the pixel
  grid (deterministic, error <= 0.5 px, provably stays inside the window);
* windows are CLOSED on all four edges, so a segment running along a shared
  tile border is emitted into both adjacent tiles — the buffered-border
  behavior MVT renderers expect.

Bounds for int64 safety (asserted): world size 2^z*4096 < 2^31 and segment
span |dx|,|dy| <= 2^20: every product stays under 2^53.

The whole predicate + clip-point pipeline is generated ONCE as an ordered
list of named integer-SQL steps (`clip_steps_sql` / `clip_point_steps_sql`)
and consumed verbatim by BOTH engines — Spark via chained selectExpr
(Catalyst collapses to one projection, whole-stage codegen), DuckDB via
generated chained CTEs — so the hash gate compares two candidate generators
against one shared formula text, the snap.py/overlap.py discipline.

Plan shape (100 TB): each segment explodes onto the tiles of its bbox
(closed-window adjusted, <= (span/4096 + 2)^2 tiles, ~4 for street-scale
ways), a generate-only explode with no shuffle. The only exchange is
whatever the consumer does next (e.g. groupBy tile for the MVT sink) —
clipping itself is map-only.

Known, measured codegen trade: fusing the explode with the full exact-
integer step chain overflows janino's 64 KB method limit (the Generate
doConsume inlines every step), so Spark logs "Failed to compile" and
gracefully falls back to OPERATOR-level codegen for that stage. Measured
cost ~10% on this stage (4.4 s vs 4.99 s full roundtrip at sf0.1);
an observe() barrier, methodSplitThreshold=256 and excluding
CollapseProject were all tried and do not restore WSCG (the consume chain
fuses regardless). The formula text is shared verbatim with the DuckDB
oracle, so restructuring the chain to appease codegen would fork the
formulas the hash gate exists to pin — the fallback is the better trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTENT = 4096  # MVT pixel grid per tile


def clip_steps_sql(
    x0: str = "x0", y0: str = "y0", x1: str = "x1", y1: str = "y1",
    tx: str = "tx", ty: str = "ty",
) -> list[tuple[str, str]]:
    """Ordered (name, integer-SQL) steps from world-pixel segment endpoints +
    a candidate tile to the normalized Liang–Barsky state and the boolean
    ``hit``.  Engine-neutral SQL: CASE/least/greatest/*/BETWEEN only."""
    e = EXTENT
    steps = [
        ("sx", f"CASE WHEN {x1} < {x0} THEN -1 ELSE 1 END"),
        ("sy", f"CASE WHEN {y1} < {y0} THEN -1 ELSE 1 END"),
        ("nx0", f"sx * {x0}"),
        ("ny0", f"sy * {y0}"),
        ("ndx", f"sx * {x1} - sx * {x0}"),
        ("ndy", f"sy * {y1} - sy * {y0}"),
        ("nwxl", f"least(sx * ({tx} * {e}), sx * ({tx} * {e} + {e}))"),
        ("nwxh", f"greatest(sx * ({tx} * {e}), sx * ({tx} * {e} + {e}))"),
        ("nwyl", f"least(sy * ({ty} * {e}), sy * ({ty} * {e} + {e}))"),
        ("nwyh", f"greatest(sy * ({ty} * {e}), sy * ({ty} * {e} + {e}))"),
        # per-axis enter/leave fractions (den > 0 always; degenerate axis
        # contributes the full [0, 1] interval and is range-checked instead)
        ("exn", "CASE WHEN ndx > 0 THEN nwxl - nx0 ELSE 0 END"),
        ("lxn", "CASE WHEN ndx > 0 THEN nwxh - nx0 ELSE 1 END"),
        ("xd", "CASE WHEN ndx > 0 THEN ndx ELSE 1 END"),
        ("eyn", "CASE WHEN ndy > 0 THEN nwyl - ny0 ELSE 0 END"),
        ("lyn", "CASE WHEN ndy > 0 THEN nwyh - ny0 ELSE 1 END"),
        ("yd", "CASE WHEN ndy > 0 THEN ndy ELSE 1 END"),
        ("okx", "ndx > 0 OR (nx0 BETWEEN nwxl AND nwxh)"),
        ("oky", "ndy > 0 OR (ny0 BETWEEN nwyl AND nwyh)"),
        # enter = max(x-frac, y-frac, 0); leave = min(x-frac, y-frac, 1)
        ("men", "CASE WHEN exn * yd >= eyn * xd THEN exn ELSE eyn END"),
        ("med", "CASE WHEN exn * yd >= eyn * xd THEN xd ELSE yd END"),
        ("en", "CASE WHEN men > 0 THEN men ELSE 0 END"),
        ("ed", "CASE WHEN men > 0 THEN med ELSE 1 END"),
        ("mln", "CASE WHEN lxn * yd <= lyn * xd THEN lxn ELSE lyn END"),
        ("mld", "CASE WHEN lxn * yd <= lyn * xd THEN xd ELSE yd END"),
        ("lvn", "CASE WHEN mln < mld THEN mln ELSE mld END"),
        ("hit", "okx AND oky AND en * mld <= lvn * ed"),
    ]
    return steps


def clip_point_steps_sql(
    div: str, tx: str = "tx", ty: str = "ty"
) -> list[tuple[str, str]]:
    """The clip-point quantization steps (apply AFTER filtering on ``hit`` —
    under ``hit`` every numerator is >= 0, so truncating and flooring integer
    division agree; ``div`` is the engine token, Spark ``DIV``, DuckDB ``//``).
    Round-half-up of the exact rational clip point; outputs are tile-local
    pixels in [0, EXTENT] on both axes."""
    e = EXTENT

    def rnd(num: str, den: str) -> str:
        return f"(2 * ({num}) + {den}) {div} (2 * {den})"

    return [
        ("px0", f"sx * (nx0 + {rnd('en * ndx', 'ed')}) - {tx} * {e}"),
        ("py0", f"sy * (ny0 + {rnd('en * ndy', 'ed')}) - {ty} * {e}"),
        ("px1", f"sx * (nx0 + {rnd('lvn * ndx', 'mld')}) - {tx} * {e}"),
        ("py1", f"sy * (ny0 + {rnd('lvn * ndy', 'mld')}) - {ty} * {e}"),
    ]


def candidate_tile_bounds_sql(
    lo: str, hi: str, z: int, div: str
) -> tuple[str, str]:
    """Closed-window candidate tile range for one axis from the segment's
    bbox [lo, hi] (world px): a coordinate exactly on a tile border belongs
    to BOTH adjacent tiles, so the low end backs up one tile when lo sits on
    a border — uniformly via floor((lo-1)/EXTENT), clamped to the world.
    ``div`` is the integer-division token (Spark ``DIV``, DuckDB ``//``)."""
    e = EXTENT
    # lo - 1 can be -1 at the world edge: add one EXTENT before the integer
    # divide so the dividend is nonnegative (trunc == floor in both engines),
    # then subtract the tile again.
    t_lo = f"greatest(({lo} - 1 + {e}) {div} {e} - 1, 0)"
    t_hi = f"least({hi} {div} {e}, {2**z - 1})"
    return t_lo, t_hi


def clip_segments_to_tiles(segs: DataFrame, z: int) -> DataFrame:
    """(way_id, seg_idx, x0, y0, x1, y1 world px at zoom z) → one row per
    (tile, clipped segment): way_id, seg_idx, tx, ty, px0, py0, px1, py1
    with pixels tile-local in [0, EXTENT].  Inputs must satisfy
    0 <= coord <= 2^z * EXTENT and |x1-x0|, |y1-y0| <= 2^20."""
    lo_x, hi_x = candidate_tile_bounds_sql("least(x0, x1)", "greatest(x0, x1)", z, "DIV")
    lo_y, hi_y = candidate_tile_bounds_sql("least(y0, y1)", "greatest(y0, y1)", z, "DIV")
    cand = segs.selectExpr(
        "*",
        f"explode(sequence(CAST(({lo_x}) AS BIGINT), CAST(({hi_x}) AS BIGINT))) AS tx",
    ).selectExpr(
        "*",
        f"explode(sequence(CAST(({lo_y}) AS BIGINT), CAST(({hi_y}) AS BIGINT))) AS ty",
    )
    for name, expr in clip_steps_sql():
        cand = cand.selectExpr("*", f"{expr} AS {name}")
    out = cand.filter(F.col("hit"))
    for name, expr in clip_point_steps_sql(div="DIV"):
        out = out.selectExpr("*", f"{expr} AS {name}")
    return out.select(
        "way_id", "seg_idx", "tx", "ty", "px0", "py0", "px1", "py1"
    )


def clip_oracle_ctes(seg_cte: str, z: int) -> str:
    """DuckDB twin: the SAME step texts chained as CTEs over a brute-force
    candidate join (segments × the same bbox tile ranges via generate_series)
    — different candidate generator wiring, byte-identical clip formulas."""
    lo_x, hi_x = candidate_tile_bounds_sql("least(x0, x1)", "greatest(x0, x1)", z, "//")
    lo_y, hi_y = candidate_tile_bounds_sql("least(y0, y1)", "greatest(y0, y1)", z, "//")
    sql = f"""WITH seg AS ({seg_cte}),
cand AS (
  SELECT seg.*, tx.tx, ty.ty
  FROM seg,
       LATERAL (SELECT unnest(generate_series({lo_x}, {hi_x})) AS tx) tx,
       LATERAL (SELECT unnest(generate_series({lo_y}, {hi_y})) AS ty) ty)"""
    prev = "cand"
    for i, (name, expr) in enumerate(clip_steps_sql()):
        sql += f",\nc{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"c{i}"
    sql += f",\nhitrows AS (SELECT * FROM {prev} WHERE hit)"
    prev = "hitrows"
    for i, (name, expr) in enumerate(clip_point_steps_sql(div="//")):
        sql += f",\np{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"p{i}"
    sql += (
        f"\nSELECT way_id, seg_idx, tx, ty, px0, py0, px1, py1 FROM {prev}"
    )
    return sql
