"""Google Encoded Polyline (precision 5) — the de-facto interchange codec for
route/track geometry (public algorithm: developers.google.com "Encoded
Polyline Algorithm Format"; same scheme as OSRM/Valhalla output).

Encoding per coordinate stream: round to 1e-5 degrees, delta against the
previous point, zigzag the sign (d<0 → -2d-1, else 2d), emit little-endian
5-bit chunks, each +63, with bit 6 (32) set while more chunks follow.

Implementation discipline (the hilbert.py rule): every step is ONE
engine-neutral SQL text consumed verbatim by Spark (F.expr) and DuckDB —
only `&`, comparisons, chr(), concatenation, and exact `/` on multiples of
powers of two (quotient <= 31, exact in IEEE double, cast back) — so the
encoded strings hash identically cross-engine with zero floating point
effects. Deltas come from one lag window; the per-row chunk strings
concatenate with an ordered string aggregation. No Python anywhere.

The zigzagged 1e-5-degree deltas are < 2^27 (|delta| <= 3.6e7), so 6 chunks
(30 bits) always suffice — chunk texts are generated for i = 0..5.

A plain-Python decoder is provided for tests (roundtrip + the published
Google example vector).
"""

from __future__ import annotations

N_CHUNKS = 6  # 5 bits each: covers |zigzag| < 2^30; deltas here are < 2^27


def sql_round_e5(x: str) -> str:
    """lat7 (1e-7 deg) -> lat5 (1e-5 deg), half away from zero (the
    reference codec's rounding, osmio lib.rs:159-164), engine-neutral."""

    def nn(e: str) -> str:  # floor-div-100 of a NONNEGATIVE expression
        return f"CAST((({e}) - (({e}) % 100)) / 100 AS BIGINT)"

    return (
        f"(CASE WHEN ({x}) >= 0 THEN {nn(f'({x}) + 50')} "
        f"ELSE -{nn(f'-({x}) + 50')} END)"
    )


def sql_zigzag(d: str) -> str:
    return f"(CASE WHEN ({d}) < 0 THEN -2 * ({d}) - 1 ELSE 2 * ({d}) END)"


def sql_chunks(zz: str) -> str:
    """Encoded-chunk string for a nonnegative zigzag column/expr ``zz``."""
    parts = []
    for i in range(N_CHUNKS):
        lo = 1 << (5 * i)
        mask = 31 * lo
        nxt = 1 << (5 * (i + 1))
        chunk = f"CAST((({zz}) & {mask}) / {lo} AS BIGINT)"
        cont = f"(CASE WHEN ({zz}) >= {nxt} THEN 32 ELSE 0 END)"
        # chr() binds to INTEGER in DuckDB (BIGINT needs the cast); Spark
        # accepts the same cast text
        ch = f"chr(CAST({chunk} + {cont} + 63 AS INTEGER))"
        if i == 0:
            parts.append(ch)
        else:
            parts.append(f"(CASE WHEN ({zz}) >= {lo} THEN {ch} ELSE '' END)")
    return " || ".join(parts)


def decode_polyline(s: str) -> list[tuple[int, int]]:
    """Inverse (plain Python, for tests): encoded string -> [(lat5, lon5)]."""
    out, coord, acc, shift, idx = [], [], 0, 0, 0
    for ch in s:
        b = ord(ch) - 63
        acc |= (b & 31) << shift
        shift += 5
        if not b & 32:
            d = ~(acc >> 1) if acc & 1 else acc >> 1
            coord.append(d)
            acc = shift = 0
            if len(coord) == 2:
                prev = out[-1] if out else (0, 0)
                out.append((prev[0] + coord[0], prev[1] + coord[1]))
                coord = []
    if coord or shift:
        raise ValueError("truncated polyline")
    return out
