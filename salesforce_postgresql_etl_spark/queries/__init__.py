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

_MODULES = (
    "relational",
    "aggregates",
    "windows",
    "scalars",
    "llm",
    "llm_ext",
    "stream_equiv",
    "udfs",
    "sources_q",
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
