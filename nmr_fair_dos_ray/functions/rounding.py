"""DuckDB-compatible rounding (half away from zero).

numpy/pandas ``round`` is banker's rounding (half to even); DuckDB's
``round(x, d)`` rounds halves away from zero. Values that are binary-exact
halves at the target digit (e.g. 141/32 = 4.40625) therefore diverge:
4.4062 (numpy) vs 4.4063 (DuckDB). Every pipeline column that an oracle_sql
entry rounds MUST use this helper so value-hashes match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x, digits: int):
    """Element-wise round, halves away from zero (DuckDB semantics)."""
    scale = 10.0 ** digits
    if isinstance(x, pd.Series):
        v = x.to_numpy(dtype=np.float64)
        return pd.Series(
            np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale, index=x.index
        )
    v = np.asarray(x, dtype=np.float64)
    out = np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale
    return float(out) if np.isscalar(x) or out.ndim == 0 else out
