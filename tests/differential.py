"""Differential compare: Spark result vs DuckDB oracle.

Mirrors the driver's t2 check (__spark_entry__.py docstring): row count,
column-name schema, and an order-insensitive value comparison. Values
are compared EXACTLY (no tolerance): registered queries are responsible
for determinism (decimal sums, rounding) so that exact equality holds.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def canon_cell(v):
    """Canonicalize one cell into a hashable, engine-neutral form."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_cell(x)) for k, x in v.items()))
    if hasattr(v, "item"):  # numpy scalar
        return canon_cell(v.item())
    return v


def _rows_to_multiset(rows, col_order):
    out = []
    for r in rows:
        out.append(tuple(canon_cell(r[i]) for i in col_order))
    return sorted(out, key=lambda t: tuple(repr(x) for x in t))


def compare(spark_df, duck_con, oracle_sql: str, name: str = "?") -> None:
    """Assert Spark df and DuckDB oracle agree. Raises AssertionError."""
    duck_rel = duck_con.sql(oracle_sql)
    d_cols = [c.lower() for c in duck_rel.columns]
    s_cols = [c.lower() for c in spark_df.columns]
    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_rows = spark_df.collect()
    d_rows = duck_rel.fetchall()
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    # align duck columns to spark's sorted-column order
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = [d_cols.index(s_cols[i]) for i in order]
    s_ms = _rows_to_multiset(s_rows, order)
    d_ms = _rows_to_multiset(d_rows, d_order)
    if s_ms != d_ms:
        diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:5]
        raise AssertionError(
            f"[{name}] value mismatch; first diffs (spark vs duck): {diffs}"
        )
