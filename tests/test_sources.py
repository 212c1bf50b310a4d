"""Source/sink behaviors beyond the differential (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.queries.sources_q import q_scan_project
from salesforce_postgresql_etl_spark.sources import load
from salesforce_postgresql_etl_spark.sources.incremental import (
    WatermarkStore,
    advance_watermark,
    incremental_extract,
)
from salesforce_postgresql_etl_spark.sources.jdbc import jdbc_available

from .conftest import SF_DIR


def test_scan_pushdown_reaches_parquet(spark):
    # The scale feature of S1: filter + projection must reach the scan.
    plan = (
        q_scan_project(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in plan
    assert "l_shipdate" not in plan.split("ReadSchema")[1][:200], (
        "projection not pruned: unused columns in ReadSchema"
    )


def test_watermark_store_roundtrip(tmp_path, spark):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    e = load(spark, SF_DIR, "events")

    # First run: no watermark → full extract.
    full = incremental_extract(e, "ts", store, "events")
    assert full.count() == e.count()

    # Advance to max(ts), then a re-run extracts nothing new.
    wm = advance_watermark(e, "ts", store, "events")
    assert wm is not None
    again = incremental_extract(e, "ts", store, "events")
    assert again.count() == 0

    # Mid-range watermark extracts exactly the newer slice.
    store.set("events", "2024-01-15 00:00:00")
    part = incremental_extract(e, "ts", store, "events")
    expected = e.where(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
    assert part.count() == expected.count() > 0


def test_run_sql_matches_duckdb(spark, duck):
    # The ad-hoc SQL surface: a user-authored ANSI query (not one of
    # the registered 89) must produce the same rows as DuckDB over the
    # same views — the "switch engines, keep your SQL" contract.
    from salesforce_postgresql_etl_spark.sources import run_sql

    sql = """
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_custs
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 0
    GROUP BY n.n_name
    """
    got = sorted((r.n_name, r.n_custs) for r in run_sql(spark, SF_DIR, sql).collect())
    exp = sorted(map(tuple, duck.sql(sql).fetchall()))
    assert got == exp and len(got) > 0


def test_incremental_lag_overlap(tmp_path, spark):
    # Visibility-lag re-extract (r4, advisor): ts > wm - lag. A row
    # stamped exactly at the watermark is invisible at lag=0 but
    # re-extracted with any positive lag.
    store = WatermarkStore(str(tmp_path / "wm.json"))
    e = load(spark, SF_DIR, "events")
    wm = advance_watermark(e, "ts", store, "events")
    assert incremental_extract(e, "ts", store, "events").count() == 0
    lagged = incremental_extract(e, "ts", store, "events", lag_seconds=3600)
    at_max = e.where(F.col("ts") == F.lit(wm).cast("timestamp_ntz")).count()
    assert lagged.count() >= at_max > 0
    expected = e.where(
        F.col("ts")
        > F.lit(wm).cast("timestamp_ntz") - F.expr("INTERVAL 3600 SECONDS")
    )
    assert lagged.count() == expected.count()


def test_merge_sql_all_key_columns():
    # An all-key table has nothing to UPDATE on match — the generated
    # SQL must stay valid (no empty SET list) in both dialects.
    from salesforce_postgresql_etl_spark.sources.jdbc import (
        _merge_sql,
        _upsert_sql,
    )

    m = _merge_sql("t", "s", ["a", "b"], ["a", "b"])
    assert "WHEN MATCHED" not in m and "WHEN NOT MATCHED" in m
    u = _upsert_sql("t", "s", ["a", "b"], ["a", "b"])
    assert "DO NOTHING" in u and "DO UPDATE" not in u
    # The normal case keeps the update branches.
    assert "WHEN MATCHED THEN UPDATE SET" in _merge_sql("t", "s", ["a", "b"], ["a"])
    assert "DO UPDATE SET" in _upsert_sql("t", "s", ["a", "b"], ["a"])


def test_incremental_predicate_pushes_down(tmp_path, spark):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    store.set("events", "2024-01-15 00:00:00")
    e = load(spark, SF_DIR, "events")
    plan = (
        incremental_extract(e, "ts", store, "events")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ts is rebuilt from the raw long nanos column, so the pushed filter
    # can't be on ts itself — but the scan must not read all columns
    # blindly and the filter must exist post-scan. (On a source with a
    # native timestamp column the predicate reaches PushedFilters.)
    assert "Filter" in plan


def test_jdbc_derby_roundtrip(spark):
    """S4/S5 integration against embedded Derby (bundled with Spark):
    full write → read-back → staging+MERGE upsert (ANSI dialect). The
    PostgreSQL ON CONFLICT dialect stays env-gated below; the plumbing
    (Spark JDBC writer, server-side single-statement merge, staging
    drop) is identical."""
    from salesforce_postgresql_etl_spark.sources.jdbc import upsert, write_full

    url = "jdbc:derby:memory:sfpgtest;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    base = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)],
        "id bigint, name string, score double",
    )
    write_full(base, url, "accounts", props)

    def read_back():
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "accounts")
            .options(**props)
            .load()
        )
        return sorted(tuple(r) for r in df.collect())

    assert read_back() == [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 30.25)]

    # Upsert: update id=2, insert id=4 — one server-side MERGE.
    delta = spark.createDataFrame(
        [(2, "bob2", 21.0), (4, "dave", 40.0)],
        "id bigint, name string, score double",
    )
    upsert(delta, url, "accounts", ["id"], props, dialect="ansi")
    assert read_back() == [
        (1, "alice", 10.5),
        (2, "bob2", 21.0),
        (3, "carol", 30.25),
        (4, "dave", 40.0),
    ]

    # Idempotency: re-applying the same delta changes nothing.
    upsert(delta, url, "accounts", ["id"], props, dialect="ansi")
    assert len(read_back()) == 4


def test_jdbc_partitioned_read(spark):
    """(r6, VERDICT r5 #7) Partitioned parallel JDBC read against
    embedded Derby: the scan must split into >1 partition (each task
    its own range-predicated SELECT) and return exactly the rows the
    single-stream read returns — including rows AT the bounds, which
    Spark's first/last partitions must cover with open-ended ranges."""
    from salesforce_postgresql_etl_spark.sources.jdbc import (
        read_partitioned,
        write_full,
    )

    url = "jdbc:derby:memory:pjread;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    base = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(1, 101)],
        "id bigint, name string, score double",
    )
    write_full(base, url, "people", props)

    single = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .options(**props)
        .load()
    )
    assert single.rdd.getNumPartitions() == 1  # the shape being fixed

    part = read_partitioned(spark, url, "people", "id", props, num_partitions=4)
    assert part.rdd.getNumPartitions() == 4
    # No partition may be empty on this uniform key, and no row lost
    # or duplicated at the stride boundaries.
    sizes = part.rdd.glom().map(len).collect()
    assert all(s > 0 for s in sizes) and sum(sizes) == 100
    assert sorted(tuple(r) for r in part.collect()) == sorted(
        tuple(r) for r in single.collect()
    )

    # Explicit bounds NARROWER than the data must still return every
    # row (Spark's outer partitions are open-ended) — the classic
    # partitioned-read footgun, pinned here.
    narrow = read_partitioned(
        spark, url, "people", "id", props, num_partitions=3, lower=20, upper=30
    )
    assert narrow.count() == 100

    # Empty table: bounds probe finds no range; falls back to a plain
    # read rather than erroring.
    write_full(base.where("id < 0"), url, "nobody", props)
    empty = read_partitioned(spark, url, "nobody", "id", props, num_partitions=4)
    assert empty.count() == 0


@pytest.mark.skipif(True, reason="no PostgreSQL server/JDBC driver in this environment")
def test_jdbc_roundtrip(spark):  # pragma: no cover — design-complete, env-gated
    from salesforce_postgresql_etl_spark.sources.jdbc import upsert, write_full

    assert jdbc_available(spark)
    url = "jdbc:postgresql://localhost:5432/test"
    props = {"user": "test", "password": "test", "driver": "org.postgresql.Driver"}
    c = load(spark, SF_DIR, "customer").limit(100)
    write_full(c, url, "customer_t", props)
    upsert(c, url, "customer_t", ["c_custkey"], props)
