"""Partition-independence sweep (not collected by pytest — run directly).

Re-verifies every oracled registered query against DuckDB under a
HOSTILE session: local[5], spark.sql.shuffle.partitions=13, AQE off.
Any dependence on parallelism, partition count, or adaptive
re-planning shows up as a hash mismatch. This is the cluster-resize
guarantee (SCALE.md "Partition-independence sweep") made empirical.

Usage:  python tests/hostile_session_sweep.py [sf_dir]

SPARK_GRAFT_HOSTILE_SKIP — comma-separated query names to exclude,
for non-fixture sf_dirs where a query's oracle embeds a
fixture-density assumption (e.g. q_quantile_sketch's fixed 0.05 rank
tolerance — see tests/test_registry_random_data.py
_GRANULARITY_SENSITIVE — which is unachievable on small random
(day,type) groups regardless of session hostility).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from salesforce_postgresql_etl_spark.queries import registry  # noqa: E402
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402
from salesforce_postgresql_etl_spark.sources import TABLES  # noqa: E402
from tests.differential import compare  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="hostile-sweep", master="local[5]", shuffle_partitions=13
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    skip = {
        n
        for n in os.environ.get("SPARK_GRAFT_HOSTILE_SKIP", "").split(",")
        if n
    }
    ok = bad = 0
    skipped: list[str] = []
    for name, q in registry().items():
        if q.oracle is None:
            continue
        if name in skip:
            skipped.append(name)
            print(f"SKIP {name} (SPARK_GRAFT_HOSTILE_SKIP)")
            continue
        try:
            compare(q.fn(spark, sf_dir), con, q.oracle, name)
            ok += 1
        except Exception as exc:
            bad += 1
            print(f"FAIL {name}: {exc}")
    # r11 ADVICE: the skip count must be visible in the one-line
    # summary so an over-broad skip list cannot silently deflate the
    # recorded coverage; only names actually skipped are counted.
    print(
        f"hostile sweep: {ok} ok, {bad} fail, {len(skipped)} skipped"
        f" (local[5], shuffle=13, AQE off)"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
