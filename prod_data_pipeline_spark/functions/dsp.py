"""Integer-scaled DFT-bin (Goertzel-style) coefficient tables.

Cross-engine determinism strategy: trigonometry is evaluated ONCE here at
module import and embedded as INTEGER literals (coefficients scaled by
1e6) into both the Arrow decode kernel and the generated DuckDB oracle
SQL.  At query time no engine runs cos/sin at all — each band projection
is an exact int64 dot product (|sample| <= 2^15, |coef| <= 1e6,
n <= ~1e3 samples => |sum| <= ~3.5e13, far inside int64), and the only
float ops left are one exact int->double conversion, one division by the
scale constant, two multiplies and one add — identical single IEEE
operations on identical inputs in Spark, numpy, and DuckDB.

Band set: normalized frequencies 1/4, 1/8, 1/16, 1/32 cycles/sample
(periods 4, 8, 16, 32) — a coarse low/mid/high split appropriate for the
short synthetic PCM clips; real deployments would swap in mel-spaced
bins, the machinery is identical.
"""

from __future__ import annotations

import math

BAND_PERIODS: tuple[int, ...] = (4, 8, 16, 32)
COEF_SCALE: int = 10**6


def goertzel_tables() -> list[tuple[int, list[int], list[int]]]:
    """(period, cos_table, sin_table) per band; tables are scaled ints."""
    out = []
    for p in BAND_PERIODS:
        cos_t = [int(round(math.cos(2 * math.pi * j / p) * COEF_SCALE)) for j in range(p)]
        sin_t = [int(round(math.sin(2 * math.pi * j / p) * COEF_SCALE)) for j in range(p)]
        out.append((p, cos_t, sin_t))
    return out
