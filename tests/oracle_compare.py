"""Order-insensitive differential comparison between a Spark DataFrame and a
DuckDB oracle result — a strict local mirror of the driver's correctness
gate (row-count + schema + order-insensitive value hash).

Canonicalization is deliberately conservative: columns sorted by name, every
value rendered to a canonical string (floats via repr of float64, timestamps
via ISO format), rows sorted. If this comparator passes, any reasonable
hash-based comparator passes too.
"""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pandas as pd


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float) and math.isnan(v):
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{int(f)}.0"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = sorted(
        tuple(_canon_value(v) for v in row) for row in out.itertuples(index=False, name=None)
    )
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, s_rows = canon_rows(spark_pdf)
    o_cols, o_rows = canon_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"{key}: column mismatch spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{key}: row count spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(
                f"{key}: first differing row #{i} (cols {s_cols}):\n  spark ={sr}\n  oracle={orow}"
            )
            break
    return problems
