"""JDBC source/sink + PostgreSQL upsert (SURVEY.md §2.1 S4/S5, §2.9 T8).

Design-complete but environment-gated: this container has no
PostgreSQL server and no JDBC driver jar, so the integration test is
skipped (tests/test_sources.py::test_jdbc_roundtrip). The code paths
are the standard production shapes:

- full load: ``df.write.jdbc`` with mode=overwrite (Spark emits the
  DDL from df.schema; partitioned writes parallelize the inserts).
- incremental upsert: Spark has no MERGE for JDBC, so write the batch
  to a staging table, then execute one
  ``INSERT ... ON CONFLICT (key) DO UPDATE`` statement server-side —
  idempotent, single round-trip, and the only scalable shape (per-row
  upserts from executors would serialize on row locks).
- streaming: ``foreachBatch(upsert_microbatch)`` reuses the same path
  per micro-batch (T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_available(spark) -> bool:
    """True if a postgresql JDBC driver is on the Spark classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.postgresql.Driver")
        return True
    except Exception:
        return False


def write_full(df: DataFrame, url: str, table: str, props: dict) -> None:
    """S4: full (re)load — DDL derived from df.schema."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**props)
        .mode("overwrite")
        .save()
    )


def _upsert_sql(table: str, staging: str, cols: list[str], key_cols: list[str]) -> str:
    collist = ", ".join(cols)
    keylist = ", ".join(key_cols)
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in cols if c not in key_cols)
    return (
        f"INSERT INTO {table} ({collist}) SELECT {collist} FROM {staging} "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {sets}"
    )


def upsert(
    df: DataFrame, url: str, table: str, key_cols: list[str], props: dict
) -> None:
    """S5: staging-table + ON CONFLICT merge (idempotent incremental load)."""
    staging = f"{table}__staging"
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .options(**props)
        .mode("overwrite")
        .save()
    )
    # One server-side MERGE statement via the JVM DriverManager.
    jvm = df.sparkSession._jvm
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        stmt.execute(_upsert_sql(table, staging, df.columns, key_cols))
        stmt.execute(f"DROP TABLE {staging}")
        stmt.close()
    finally:
        conn.close()


def upsert_microbatch(url: str, table: str, key_cols: list[str], props: dict):
    """T8: foreachBatch hook — ``writeStream.foreachBatch(fn)``."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        upsert(batch_df, url, table, key_cols, props)

    return fn
