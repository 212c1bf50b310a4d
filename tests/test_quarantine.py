"""Dead-letter quarantine: parse split, rule split, conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources.quarantine import (
    read_json_with_quarantine,
    validate_with_quarantine,
)


@pytest.fixture()
def jsonl(tmp_path):
    p = tmp_path / "load.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"id": 1, "amount": 10.5, "who": "a"}',
                '{"id": 2, "amount": "not-a-number", "who": "b"}',  # type error
                "{this is not json",  # parse error
                '{"id": 4, "amount": 0.25, "who": "d"}',
                '{"id": 5}',  # missing fields parse as null — clean
            ]
        )
    )
    return str(p)


def test_parse_split(spark, jsonl):
    out = read_json_with_quarantine(
        spark, jsonl, "id long, amount double, who string"
    )
    clean = {r.id for r in out.clean.collect()}
    assert clean == {1, 4, 5}
    bad = out.quarantine.collect()
    assert len(bad) == 2
    # The raw payload is preserved verbatim for replay.
    assert any("not-a-number" in r.raw for r in bad)
    assert any(r.raw.startswith("{this") for r in bad)


def test_conservation(spark, jsonl):
    out = read_json_with_quarantine(
        spark, jsonl, "id long, amount double, who string"
    )
    assert out.clean.count() + out.quarantine.count() == 5


def test_rule_split_reasons(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, None, None), (4, 2.0, None)],
        "id long, amount double, who string",
    )
    out = validate_with_quarantine(
        df,
        {
            "nonpositive_amount": F.col("amount") > 0,
            "missing_who": F.col("who").isNotNull(),
        },
    )
    assert {r.id for r in out.clean.collect()} == {1}
    reasons = {r.id: r.reason for r in out.quarantine.collect()}
    assert reasons[2] == "nonpositive_amount"
    assert reasons[4] == "missing_who"
    # NULL amount fails the > 0 predicate (unknown is not good) and
    # both reasons are reported.
    assert set(reasons[3].split(",")) == {"nonpositive_amount", "missing_who"}


def test_no_rules_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        validate_with_quarantine(df, {})
