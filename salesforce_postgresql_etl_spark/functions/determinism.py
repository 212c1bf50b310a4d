"""Determinism helpers for oracle hash-parity (SURVEY.md §4.3).

Floating-point SUM/AVG are partition-order dependent in any distributed
engine, so a double-sum can differ in the last ulp between Spark and the
DuckDB oracle (and between two Spark runs with different partitioning).
The scheme used by every registered query:

1. **Sum through DECIMAL.** ``sum(cast(x as decimal))`` is exact and
   associative → identical under any execution order in both engines.
   Money semantically IS decimal (SURVEY.md §1.1 maps Salesforce
   `currency` → numeric(18,2)).
2. **Decimal→double via the integer path.** A direct decimal→double cast
   is NOT correctly rounded the same way in both engines (measured: 1 ulp
   apart on a scale-10 sum). Instead: ``cast(sum * 10^s as bigint)`` is
   exact (the decimal is integer-valued at that point), and
   ``bigint / double`` is a single correctly-rounded IEEE op in both
   engines → bit-identical doubles. Requires |sum|·10^s < 2^63 and the
   bigint < 2^53 for exactness — scales are chosen so this holds with
   orders of magnitude to spare at the checked sf.
3. **Averages as exact-sum / exact-count** — same double ops both sides.
4. ``round(x, N)`` only where math is inherently FP (stddev, corr,
   cosine) — on BOTH sides, with N small enough that a last-ulp
   difference cannot flip the rounded value in practice.

Scales: money = (12,2); rates = (7,3) so the revenue/charge product
chain stays at scale ≤ 8 and precision ≤ 33 in both engines' 38-digit
caps without any intermediate scale-reduction cast (scale-reduction
rounding modes differ between engines — Spark HALF_UP vs DuckDB
truncation — so we never reduce scale, only precision, which is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D_MONEY = "decimal(12,2)"  # prices, balances: |x| < 1e10, 2dp
D_RATE = "decimal(7,3)"  # discounts, taxes, rates: quantized to 3dp
MONEY_SCALE = 2
RATE_SCALE = 3


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: str | Column) -> Column:
    return _col(c).cast(D_MONEY)


def rate(c: str | Column) -> Column:
    return _col(c).cast(D_RATE)


def dec_to_double(dec_col: Column, scale: int, prec: int = 26) -> Column:
    """Exact decimal column → double, deterministically (scheme #2).

    Works for aggregates and per-row values alike (a plain decimal→double
    cast is also 1-ulp unstable between engines).

    ``prec`` bounds the intermediate precision: the multiply by 10^scale
    adds ~scale digits, and DuckDB hard-errors past 38 total — so for
    scale ≥ 10 pass a tighter prec (e.g. 18) sized to the actual value
    range. The precision-only cast is exact as long as the value fits.
    """
    m = 10**scale
    narrowed = dec_col.cast(f"decimal({prec},{scale})")  # precision-only: exact
    return (narrowed * F.lit(m)).cast("bigint") / F.lit(float(m))


# Back-compat name used by aggregate helpers below.
dec_sum_to_double = dec_to_double


def dsum(c: str | Column, alias: str, scale: int = MONEY_SCALE) -> Column:
    """Order-independent sum of a double column, emitted as double."""
    cast_t = f"decimal(12,{scale})" if scale <= 2 else f"decimal(18,{scale})"
    return dec_sum_to_double(F.sum(_col(c).cast(cast_t)), scale).alias(alias)


def dsum_expr(expr: Column, alias: str, scale: int) -> Column:
    """Same, for an already-decimal computed expression (e.g. revenue)."""
    return dec_sum_to_double(F.sum(expr), scale).alias(alias)


def davg(c: str | Column, alias: str, scale: int = MONEY_SCALE) -> Column:
    """Order-independent mean: exact decimal sum / exact count, as double."""
    cast_t = f"decimal(12,{scale})" if scale <= 2 else f"decimal(18,{scale})"
    return (
        dec_sum_to_double(F.sum(_col(c).cast(cast_t)), scale) / F.count(F.lit(1))
    ).alias(alias)


def rnd(c: Column, n: int = 6) -> Column:
    return F.round(c, n)


def sum_pow2(c: str | Column, alias: str, bits: int = 20) -> Column:
    """Order-independent sum of an arbitrary double column.

    Scales by 2^bits (EXACT in IEEE — power-of-two multiply), floors to
    integer (no rounding-boundary ambiguity anywhere), sums the exact
    integers, unscales. The value is quantized at 2^-bits but both
    engines quantize identically, unlike decimal casts of arbitrary
    doubles. Requires |col|·2^bits · n_rows < 2^53.
    """
    m = float(2**bits)
    scaled = F.floor(_col(c).cast("double") * F.lit(m))
    return (F.sum(scaled).cast("double") / F.lit(m)).alias(alias)


def sql_sum_pow2(col_sql: str, alias: str, bits: int = 20) -> str:
    m = 2**bits
    return (
        f"CAST(SUM(CAST(floor(CAST({col_sql} AS DOUBLE) * {m}) AS BIGINT))"
        f" AS DOUBLE) / {m}.0 AS {alias}"
    )


# --- DuckDB-side mirrors (oracle SQL string builders) ---------------------


def sql_dec_to_double(expr_sql: str, scale: int, prec: int = 26) -> str:
    m = 10**scale
    return (
        f"CAST(CAST({expr_sql} AS DECIMAL({prec},{scale})) * {m} AS BIGINT)"
        f" / CAST({m} AS DOUBLE)"
    )


def sql_dec_sum_to_double(inner_sql: str, scale: int, prec: int = 26) -> str:
    return sql_dec_to_double(f"SUM({inner_sql})", scale, prec)


def sql_dsum(col_sql: str, scale: int, alias: str) -> str:
    cast_t = f"DECIMAL(12,{scale})" if scale <= 2 else f"DECIMAL(18,{scale})"
    return f"{sql_dec_sum_to_double(f'CAST({col_sql} AS {cast_t})', scale)} AS {alias}"


def sql_davg(col_sql: str, scale: int, alias: str) -> str:
    cast_t = f"DECIMAL(12,{scale})" if scale <= 2 else f"DECIMAL(18,{scale})"
    return (
        f"{sql_dec_sum_to_double(f'CAST({col_sql} AS {cast_t})', scale)}"
        f" / COUNT(*) AS {alias}"
    )
