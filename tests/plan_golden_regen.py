"""Regenerate tests/plan_golden.py (not collected by pytest — run
directly after a DELIBERATE plan-shape change).

Runs every registered query's plan through the audit at the exact
pytest-session settings (sf0.01, local[8], shuffle.partitions=8) and
rewrites the GOLDEN dict in place, preserving the module docstring.
Commit the diff — it is the review artifact for the plan change.

Usage:  python tests/plan_golden_regen.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from salesforce_postgresql_etl_spark.plans.audit import audit  # noqa: E402
from salesforce_postgresql_etl_spark.queries import registry  # noqa: E402
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
GOLDEN_PATH = os.path.join(REPO, "tests", "plan_golden.py")


def main() -> None:
    spark = get_spark(
        app_name="plan-golden-regen", master="local[8]", shuffle_partitions=8
    )
    lines = []
    for name, q in sorted(registry().items()):
        a = audit(q.fn(spark, SF_DIR))
        lines.append(f'    "{name}": ({a.shuffles}, {a.broadcasts}),')
    src = open(GOLDEN_PATH).read()
    new = re.sub(
        r"GOLDEN = \{\n.*?\n\}\n",
        "GOLDEN = {\n" + "\n".join(lines) + "\n}\n",
        src,
        flags=re.DOTALL,
    )
    with open(GOLDEN_PATH, "w") as fh:
        fh.write(new)
    print(f"rewrote {len(lines)} entries -> {GOLDEN_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
