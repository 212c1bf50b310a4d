"""Differential compare: Spark result vs DuckDB oracle, DRIVER-STRICT.

Mirrors the driver's t2 check (__spark_entry__.py docstring): row count,
column-name schema, and an order-insensitive value-hash comparison.

Round-2 lesson (VERDICT r2 "What's wrong" #4): the old mirror was
LOOSER than the grading driver in exactly the two ways the driver
failed queries — it tuple-ized list cells (the driver's pandas
canonicalizer crashes on them: ``sort_values`` → ``factorize`` →
``unhashable type: 'list'``) and it compared ``123 == 123.0`` as equal
(the driver's hash is dtype-sensitive). This version canonicalizes
through pandas exactly like the driver:

- both results go through ``pandas`` (Spark ``toPandas()``, DuckDB
  ``.df()``), columns lowercased and sorted by name;
- ``DataFrame.sort_values`` over all columns — list/array cells raise,
  reproducing the driver's crash class instead of hiding it;
- every cell is rendered to a type-tagged string: ``I:123`` is NOT
  ``F:123.0``, ``D:1.570`` is NOT ``D:1.57`` (decimal scale matters);
- the row-stream is md5-hashed; hashes must be equal.

Temporal values are the one place both engines' pandas conversions
legitimately disagree on *container* type (DuckDB returns DATE as a
midnight datetime64, Spark returns ``datetime.date`` objects), so both
normalize to an isoformat string with a trailing midnight stripped —
deterministic and identical for equal logical values.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal

import numpy as np
import pandas as pd


class CellTypeError(TypeError):
    """A registered query emitted a non-scalar (list/struct/map) cell —
    the grading driver's canonicalizer crashes on these."""


def canon_cell(v) -> str:
    """Render one cell as a type-tagged string. Dtype-strict: the tag
    encodes the value class, so int 123 != float 123.0 and decimal
    scale is preserved — matching the driver's hash sensitivity."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise CellTypeError(
            f"non-scalar cell of type {type(v).__name__}: registered query "
            "outputs must be scalar columns (driver canonicalizer crashes "
            "on lists) — serialize with array_join/to_json"
        )
    if isinstance(v, (bool, np.bool_)):
        return f"B:{bool(v)}"
    if isinstance(v, Decimal):
        return f"D:{v}"
    if isinstance(v, (int, np.integer)):
        return f"I:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "F:NaN"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return f"F:{f!r}"
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "\x00NULL"
        s = v.isoformat(sep=" ")
        return "T:" + (s[:-9] if s.endswith(" 00:00:00") else s)
    if isinstance(v, _dt.datetime):
        s = v.replace(tzinfo=None).isoformat(sep=" ")
        return "T:" + (s[:-9] if s.endswith(" 00:00:00") else s)
    if isinstance(v, _dt.date):
        return f"T:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"X:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"S:{v}"
    raise CellTypeError(f"unrecognized cell type {type(v).__name__}: {v!r}")


def _canon_pdf(pdf: pd.DataFrame, name: str) -> pd.DataFrame:
    """Driver-shaped canonical form: lowercase cols, sort cols by name,
    sort rows by all columns (crashes on list cells, like the driver)."""
    pdf = pdf.rename(columns=lambda c: c.lower())
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        try:
            pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        except TypeError as e:
            raise CellTypeError(
                f"[{name}] driver-crash class: pandas sort_values failed "
                f"({e}) — a registered output column is list/struct-typed"
            ) from e
    return pdf.reset_index(drop=True)


def canon_hash(pdf: pd.DataFrame, name: str = "?") -> tuple[str, list[str]]:
    """md5 over the type-tagged row stream + the rendered rows (for
    diffing). Row ORDER inside the frame no longer matters for equality
    because rows are re-sorted by their rendered form."""
    rendered = []
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            # pandas uses NaN/NaT for nulls in typed columns
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                cells.append("\x00NULL")
            else:
                cells.append(canon_cell(v))
        rendered.append("\x01".join(cells))
    rendered.sort()
    h = hashlib.md5()
    for line in rendered:
        h.update(line.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest(), rendered


def compare(spark_df, duck_con, oracle_sql: str, name: str = "?") -> None:
    """Assert Spark df and DuckDB oracle agree, driver-strict.

    Raises AssertionError on any of the driver's three failure modes:
    row-count mismatch, schema (sorted column names) mismatch, or
    value-hash mismatch; raises CellTypeError on the crash class.
    """
    duck_pdf = duck_con.sql(oracle_sql).df()
    spark_pdf = spark_df.toPandas()

    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    d_cols = sorted(c.lower() for c in duck_pdf.columns)
    assert s_cols == d_cols, (
        f"[{name}] column mismatch: spark={s_cols} duck={d_cols}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"[{name}] row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    s_canon = _canon_pdf(spark_pdf, f"{name}/spark")
    d_canon = _canon_pdf(duck_pdf, f"{name}/duck")
    s_hash, s_rows = canon_hash(s_canon, name)
    d_hash, d_rows = canon_hash(d_canon, name)
    if s_hash != d_hash:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(
            f"[{name}] value-hash mismatch (dtype-strict); "
            f"first rendered diffs (spark vs duck): {diffs}"
        )


# Retained for tests that intentionally want a tolerant value compare
# (e.g. stream-vs-batch equivalence where container types differ).
def compare_loose(spark_df, duck_con, oracle_sql: str, name: str = "?") -> None:
    from decimal import Decimal as _D

    def _c(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return v
        if isinstance(v, _D):
            return _c(float(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return 0.0 if v == 0.0 else v
        if isinstance(v, _dt.datetime):
            return v.replace(tzinfo=None).isoformat(sep=" ")
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)):
            return tuple(_c(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, _c(x)) for k, x in v.items()))
        if hasattr(v, "item"):
            return _c(v.item())
        return v

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
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = [d_cols.index(s_cols[i]) for i in order]
    s_ms = sorted(
        (tuple(_c(r[i]) for i in order) for r in s_rows),
        key=lambda t: tuple(repr(x) for x in t),
    )
    d_ms = sorted(
        (tuple(_c(r[i]) for i in d_order) for r in d_rows),
        key=lambda t: tuple(repr(x) for x in t),
    )
    if s_ms != d_ms:
        diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:5]
        raise AssertionError(
            f"[{name}] value mismatch; first diffs (spark vs duck): {diffs}"
        )
