"""SQL-compatible rounding.

DuckDB's ROUND on DOUBLE rounds half AWAY FROM ZERO; numpy's ``np.round``
and Python's ``round`` use half-to-even (banker's).  On exact binary ties
the two differ — e.g. 1/128 = 0.0078125 rounds to 0.007812 (numpy) vs
0.007813 (DuckDB) at 6 digits — so every engine column mirrored by an
oracle ``ROUND(x, n)`` must round the SQL way or the value-hash gate can
fail on tie-valued inputs.  pyarrow users pass
``pc.round(..., round_mode="half_towards_infinity")`` (verified equal to
DuckDB on tie cases); numpy users call :func:`sql_round`.
"""

from __future__ import annotations

import numpy as np


def sql_round(x, ndigits: int = 6):
    """Half-away-from-zero rounding matching DuckDB ROUND on DOUBLE."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    out = np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale
    return float(out) if np.isscalar(x) or out.ndim == 0 else out
