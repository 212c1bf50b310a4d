"""Capture .explain('formatted') for every bench entry (r13 optimization
round deliverable: plans/r13/<query>_{before,after}.txt).

Usage: python tests/plan_capture.py before|after [name ...]

Builds each bench entry's DataFrame exactly as bench.py does (same
session shape, same sf_dir resolution) and writes the formatted plan to
plans/r13/. Names default to the full bench set (registered headliners
+ the _extra_benches scale paths).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from salesforce_postgresql_etl_spark.queries import all_queries  # noqa: E402
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "arg 1 must be before|after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="plan-capture", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = all_queries()
    qs.update(bench._extra_benches())
    names = sys.argv[2:] or (bench.BENCH_QUERIES + sorted(bench._extra_benches()))
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}", flush=True)
        except Exception as exc:
            print(f"ERROR {name}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
