"""The sqllogictest analog: every registered query with an oracle runs on
both engines at sf0.01 and must match exactly (SURVEY.md §5.2.2).
Rows-only queries are smoke-run (must execute, schema stable)."""

from __future__ import annotations

import pytest

from salesforce_postgresql_etl_spark.queries import registry

from .conftest import SF_DIR
from .differential import compare

_REG = registry()
_SQL_NAMES = sorted(n for n, q in _REG.items() if q.oracle is not None)
_ROWS_NAMES = sorted(n for n, q in _REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", _SQL_NAMES)
def test_oracle_match(name, spark, duck):
    q = _REG[name]
    df = q.fn(spark, SF_DIR)
    compare(df, duck, q.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_NAMES)
def test_rows_only_runs(name, spark):
    q = _REG[name]
    df = q.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
