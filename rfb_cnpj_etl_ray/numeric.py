"""Engine-neutral numeric rules shared across operators.

DuckDB ``ROUND`` is half-AWAY-from-zero; numpy/pandas/pyarrow default to
half-to-even. The divergence is deterministic on dyadic rationals
(np.round(17/32, 4) = 0.5312 vs SQL 0.5313) — exactly the values
integer-ratio metrics (jaccard, averages of counts) produce — so every
rounded float that an oracle reproduces must go through these helpers
(or ``pc.round(..., round_mode="half_towards_infinity")``). ADVICE r2.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 4) -> np.ndarray:
    """Round half away from zero (the SQL ROUND rule), vectorized."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale
