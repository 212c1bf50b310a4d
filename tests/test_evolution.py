"""Schema-evolution reads: vintage union, widening, narrowing refusal."""

from __future__ import annotations

import pytest

from salesforce_postgresql_etl_spark.sources.evolution import read_conformed


@pytest.fixture()
def vintages(spark, tmp_path):
    base = str(tmp_path / "t")
    # v1: original schema
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id int, amount int"
    ).write.parquet(f"{base}/v1")
    # v2: amount widened to long, new column added
    spark.createDataFrame(
        [(3, 3_000_000_000, "c")], "id int, amount long, who string"
    ).write.parquet(f"{base}/v2")
    # v3: amount dropped upstream
    spark.createDataFrame([(4,)], "id int").write.parquet(f"{base}/v3")
    return base


def test_conforms_all_vintages(spark, vintages):
    out = read_conformed(
        spark, f"{vintages}/*", "id long, amount long, who string"
    )
    rows = {r.id: (r.amount, r.who) for r in out.collect()}
    assert rows == {
        1: (10, None),
        2: (20, None),
        3: (3_000_000_000, "c"),
        4: (None, None),
    }
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "bigint", "string",
    ]


def test_extra_columns_dropped(spark, vintages):
    out = read_conformed(spark, f"{vintages}/*", "id long, amount long")
    assert out.columns == ["id", "amount"]


def test_narrowing_refused(spark, vintages):
    with pytest.raises(ValueError, match="narrowing"):
        read_conformed(spark, f"{vintages}/*", "id long, amount int, who string")


def test_decimal_widening_rules(spark, tmp_path):
    p = str(tmp_path / "d")
    spark.sql("SELECT CAST(1.25 AS DECIMAL(5,2)) AS d").write.parquet(p)
    ok = read_conformed(spark, p, "d decimal(10,4)")
    assert str(ok.collect()[0].d) == "1.2500"
    with pytest.raises(ValueError, match="narrowing"):
        read_conformed(spark, p, "d decimal(5,1)")
