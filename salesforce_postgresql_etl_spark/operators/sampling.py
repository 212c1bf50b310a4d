"""Deterministic sampling / dataset-split operators (training-data
pipeline surface, alongside dedup and similarity — SURVEY.md §2.11+).

Everything is hash-threshold based, never RNG based:

- reproducible across runs, retries, partitionings, and ENGINES — the
  bucket is ``substring(md5(seed || ':' || key), 1, 2)``, and md5 is
  the one hash Spark and DuckDB compute identically (the repo's
  cross-engine doctrine), so every assignment is DuckDB-oracleable;
- stable under data growth: a row's split membership depends only on
  its own key, so appending data never reshuffles old rows between
  splits (the property that makes hash-splits the production standard
  for train/test hygiene);
- per-row expressions only — no shuffle, no state; at 100 TB this is
  a free rider on whatever scan is already happening, and the split
  column can partition the output layout (``partitionBy("split")``).

Fractions are quantized to 1/256 (two hex digits). That is deliberate:
a coarser, EXACT boundary both engines agree on beats a "precise"
boundary that drifts (0.8 → 205/256 ≈ 0.80078). The expected fraction
error is ≤ 1/512 per label; tests pin the realized fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: str) -> Column:
    """2-hex-digit uniform bucket in '00'..'ff' (256 values).

    NULL keys coalesce to the sentinel '<null>' so every row — including
    null-keyed ones — lands in exactly one bucket; without this, md5(NULL)
    is NULL, every CASE arm is NULL, and hash_split's disjoint+exhaustive
    contract silently breaks for null keys."""
    k = F.coalesce(key.cast("string"), F.lit("<null>"))
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), k)), 1, 2)


def _bucket_sql(key_sql: str, seed: str) -> str:
    k = f"COALESCE(CAST({key_sql} AS VARCHAR), '<null>')"
    return f"substring(md5('{seed}:' || {k}), 1, 2)"


def _boundary(n: int) -> str:
    """Upper-exclusive string boundary for the first n of 256 buckets.
    n=256 → 'g', which compares greater than every hex pair."""
    if not 0 <= n <= 256:
        raise ValueError(f"boundary out of range: {n}")
    return "g" if n == 256 else f"{n:02x}"


def _cum_boundaries(fractions: dict[str, float]) -> list[tuple[str, str]]:
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions.values())}")
    out, cum = [], 0.0
    for label, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {label!r}")
        cum += frac
        out.append((label, _boundary(round(cum * 256))))
    # Guard against float accumulation leaving the last boundary short.
    out[-1] = (out[-1][0], _boundary(256))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split label, keyed on its own id.

    ``fractions``: ordered {label: fraction} summing to 1 (dict order
    defines the bucket ranges, so the same dict always yields the same
    assignment). Disjoint + exhaustive by construction.
    """
    b = _bucket(F.col(key_col), seed)
    expr = None
    for label, bound in _cum_boundaries(fractions):
        cond = b < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out_col, expr)


def hash_split_sql(
    key_sql: str, fractions: dict[str, float], seed: str = "split"
) -> str:
    """The identical assignment as a SQL CASE expression (the oracle)."""
    b = _bucket_sql(key_sql, seed)
    arms = " ".join(
        f"WHEN {b} < '{bound}' THEN '{label}'"
        for label, bound in _cum_boundaries(fractions)
    )
    return f"CASE {arms} END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "sample",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (strata absent
    from ``fractions`` are dropped — an explicit allowlist, the common
    shape for per-language quota sampling in corpus construction)."""
    b = _bucket(F.col(key_col), seed)
    keep = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction out of [0,1] for {stratum!r}")
        cond = (F.col(strata_col) == stratum) & (b < F.lit(_boundary(round(frac * 256))))
        keep = cond if keep is None else keep | cond
    return df.where(keep)


def stratified_sample_sql(
    strata_sql: str, fractions: dict[str, float], key_sql: str, seed: str = "sample"
) -> str:
    """WHERE-clause predicate matching stratified_sample exactly."""
    b = _bucket_sql(key_sql, seed)
    return " OR ".join(
        f"({strata_sql} = '{s}' AND {b} < '{_boundary(round(f * 256))}')"
        for s, f in fractions.items()
    )


def _copies(weight: float) -> tuple[int, str]:
    """Split a mixture weight into (floor, fractional-part boundary)."""
    if weight < 0:
        raise ValueError(f"negative mixture weight: {weight}")
    base = int(weight)
    return base, _boundary(round((weight - base) * 256))


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: str = "mix",
    default_weight: float = 0.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic domain-mixture resampling — up AND down weighting.

    Corpus mixing ("2× books, 0.3× common-crawl") needs expected copy
    count = weight per row: weight 2.5 → 2 copies always, a 3rd for
    the hash-selected half of rows; weight 0.25 → one copy for a
    quarter of rows. Copies carry ``copy_col`` = 1..n so downstream
    shuffles see distinct rows. Same doctrine as hash_split: the
    decision hangs only on md5(seed:key), so it is retry/engine/
    append-stable, and the fractional part is quantized to 1/256.
    Domains absent from ``weights`` get ``default_weight``.

    Scale shape: per-row expressions + an explode that multiplies
    output exactly by the intended mixture factor — no shuffle; the
    0-copy rows are filtered before the explode.
    """
    w_expr = None
    for domain, w in weights.items():
        base, bound = _copies(w)
        n = F.lit(base) + (
            _bucket(F.col(key_col), seed) < F.lit(bound)
        ).cast("int")
        cond = F.col(domain_col) == domain
        w_expr = F.when(cond, n) if w_expr is None else w_expr.when(cond, n)
    dbase, dbound = _copies(default_weight)
    dflt = F.lit(dbase) + (
        _bucket(F.col(key_col), seed) < F.lit(dbound)
    ).cast("int")
    w_expr = dflt if w_expr is None else w_expr.otherwise(dflt)
    return (
        df.withColumn("_n_copies", w_expr)
        .where(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
        .withColumn(copy_col, F.col(copy_col).cast("bigint"))
    )


def mixture_copies_sql(
    domain_sql: str,
    weights: dict[str, float],
    key_sql: str,
    seed: str = "mix",
    default_weight: float = 0.0,
) -> str:
    """The per-row copy count as a SQL CASE expression (the oracle
    pairs it with DuckDB's ``unnest(range(1, n+1))`` to materialize
    copies)."""
    b = _bucket_sql(key_sql, seed)
    arms = " ".join(
        "WHEN {d} = '{v}' THEN {base} + CASE WHEN {b} < '{bound}' THEN 1 ELSE 0 END".format(
            d=domain_sql, v=domain, base=_copies(w)[0], b=b, bound=_copies(w)[1]
        )
        for domain, w in weights.items()
    )
    dbase, dbound = _copies(default_weight)
    return (
        f"CASE {arms} ELSE {dbase} + "
        f"CASE WHEN {b} < '{dbound}' THEN 1 ELSE 0 END END"
    )
