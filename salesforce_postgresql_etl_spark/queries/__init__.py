"""Query registry — the t2 contract surface.

Every operator family module registers its queries here with
``@register(name, oracle=...)``. ``__spark_entry__.py`` exposes the
registry to the driver. Registration discipline (SURVEY.md §2): a name
is only registered once its DuckDB differential passes locally.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# Registration order IS the driver's grading order: the t2 harness checks
# the first N registered queries (N=27 in r1, 50 in r2/r3). Round-4
# rotation (VERDICT r3 #1): the 32 queries that were stale (windows,
# half of scalars — green only in r02), fixed-but-unregraded
# (q_str_funcs/q_math_funcs), or never graded (streaming, UDFs,
# sources, JSON/array/map/hash scalars) move to the FRONT; the llm +
# llm_ext families (all driver-green in r03) anchor the tail of the
# window. windows 1-9, scalars 10-20, stream_equiv 21-25, udfs 26-30,
# sources_q 31-35, llm 36-43, llm_ext 44-50 — exactly 50. relational
# (51-77) and aggregates (78-85) rotate out; both were fully green in
# r03 (see COVERAGE.md ledger for per-query last-green rounds).
_MODULES = (
    "windows",
    "scalars",
    "stream_equiv",
    "udfs",
    "sources_q",
    "llm",
    "llm_ext",
    "relational",
    "aggregates",
    # r4 additions append at the tail (slots 86+) so the graded window
    # 1-50 stays exactly the rotation recorded in COVERAGE.md.
    "sampling_q",
    "corpus_q",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")


def registry() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in registry().items()}


def all_oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in registry().items() if q.oracle is not None}
