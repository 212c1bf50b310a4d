"""Physical-plan audit: mechanical checks of the SCALE.md invariants.

SCALE.md argues, family by family, that every registered query keeps a
shape that survives a 1000-executor / 100 TB deployment: no cartesian
blowups outside deliberate oracle baselines, no row-at-a-time Python in
hot paths, no full-data single-partition funnels. This module turns the
argument into a function so a pytest (tests/test_plan_audit.py) can
assert it for every query, every round, instead of a hand audit.

The audit reads the INITIAL physical plan (pre-AQE execution) — that is
what the planner would ship to a cluster, and the shapes checked here
(join strategy, exchange partitioning, Python eval nodes) are decided
at that stage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    """Counts of scale-relevant physical operators in one query plan."""

    cartesian: int  # CartesianProduct nodes
    bnl_joins: int  # BroadcastNestedLoopJoin nodes (ok for tiny sides)
    row_udf: int  # BatchEvalPython — row-at-a-time Python, the slow path
    arrow_udf: int  # ArrowEvalPython / pandas-UDF nodes (Arrow-batched)
    single_partition: int  # Exchange SinglePartition — global funnels
    shuffles: int  # all Exchange nodes (hash/range/single)
    broadcasts: int  # BroadcastExchange nodes
    sorts: int  # Sort nodes
    scans: int  # FileScan nodes
    plan: str  # full text, for failure messages


def plan_string(df: DataFrame) -> str:
    """The physical plan as text (initial plan; AQE may still re-plan
    at runtime, but only to something with fewer/smaller shuffles)."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> PlanAudit:
    s = plan_string(df)
    count = lambda pat: len(re.findall(pat, s))
    return PlanAudit(
        cartesian=count(r"\bCartesianProduct\b"),
        bnl_joins=count(r"\bBroadcastNestedLoopJoin\b"),
        row_udf=count(r"\bBatchEvalPython\b"),
        arrow_udf=count(r"\b(?:ArrowEvalPython|FlatMapGroupsInPandas|"
                        r"AggregateInPandas|MapInPandas)\b"),
        single_partition=count(r"Exchange SinglePartition"),
        shuffles=count(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                       r"SinglePartition)"),
        broadcasts=count(r"\bBroadcastExchange\b"),
        sorts=count(r"\bSort\b"),
        scans=count(r"\bFileScan\b"),
        plan=s,
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every FileScan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema struct of every FileScan — column-pruning check."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan_string(df))
