"""Salesforce 15-char -> 18-char Id conversion, as pure JVM expressions.

The domain function of the reference tool class: Salesforce 15-char Ids
are case-SENSITIVE; APIs and warehouses want the case-INSENSITIVE
18-char form. The public algorithm appends 3 checksum chars: the 15
chars split into three 5-char chunks; within a chunk, char j (0-based)
contributes bit 2^j when it is an uppercase A-Z; the 5-bit value
indexes "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345".

No UDF: the whole conversion is substring/ascii/CASE algebra, so it
runs inside whole-stage codegen at full scan speed — converting a
100 TB extract's Id column costs the same as reading it. The identical
expression tree is emitted as SQL text for the DuckDB oracle
(``sql_sf_id_15_to_18``), so the driver hash-checks the algorithm
itself, not a reimplementation.

Contract: 15-char input -> 18-char output; 18-char input passes
through unchanged (already converted); any other length -> NULL
(malformed — quarantine upstream, sources/quarantine.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345"


def _chunk_bits(col: Column, chunk: int) -> Column:
    """5-bit uppercase mask of chunk ``chunk`` (0..2) of a 15-char id."""
    bits = F.lit(0)
    for j in range(5):
        pos = 5 * chunk + j + 1  # substring is 1-based
        ch = F.substring(col, pos, 1)
        is_upper = F.ascii(ch).between(65, 90).cast("int")
        bits = bits + is_upper * F.lit(1 << j)
    return bits


def sf_id_15_to_18(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    suffix = F.concat(
        *[
            F.substring(F.lit(_ALPHABET), _chunk_bits(c, i) + 1, 1)
            for i in range(3)
        ]
    )
    return (
        F.when(F.length(c) == 18, c)
        .when(F.length(c) == 15, F.concat(c, suffix))
        .otherwise(F.lit(None).cast("string"))
    )


def sql_chunk_bits(col_sql: str, chunk: int) -> str:
    terms = []
    for j in range(5):
        pos = 5 * chunk + j + 1
        terms.append(
            f"(CASE WHEN ascii(substring({col_sql}, {pos}, 1)) "
            f"BETWEEN 65 AND 90 THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def sql_sf_id_15_to_18(col_sql: str) -> str:
    """The same conversion as ANSI-ish SQL text for the DuckDB oracle."""
    suffix = " || ".join(
        f"substring('{_ALPHABET}', {sql_chunk_bits(col_sql, i)} + 1, 1)"
        for i in range(3)
    )
    return (
        f"(CASE WHEN length({col_sql}) = 18 THEN {col_sql} "
        f"WHEN length({col_sql}) = 15 THEN {col_sql} || {suffix} "
        f"ELSE NULL END)"
    )
