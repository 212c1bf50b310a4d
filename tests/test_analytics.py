"""Operator tests for funnel analysis (operators/funnel.py) plus
hand-checked cases for the cohort/TWA query shapes. Driver-strict
differentials for the registered queries live in test_differential.py."""

from __future__ import annotations

import datetime as dt

import pytest

from salesforce_postgresql_etl_spark.operators.funnel import funnel_stages

_SCHEMA = "user_id long, ts timestamp_ntz, event_type string"


def _t(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _t(ts), et) for u, ts, et in rows], _SCHEMA
    )


def _stages(df):
    return {r["user_id"]: r["funnel_stage"] for r in df.collect()}


class TestFunnel:
    STAGES = ("signup", "click", "purchase")

    def test_order_matters(self, spark):
        e = _events(
            spark,
            [
                # u1 completes in order -> stage 3
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T01:00", "click"),
                (1, "2024-01-01T02:00", "purchase"),
                # u2 has all three but purchase BEFORE click -> stage 2
                (2, "2024-01-01T00:00", "signup"),
                (2, "2024-01-01T02:00", "click"),
                (2, "2024-01-01T01:00", "purchase"),
                # u3 never signed up -> stage 0 even with later stages
                (3, "2024-01-01T00:00", "click"),
                (3, "2024-01-01T01:00", "purchase"),
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES)) == {1: 3, 2: 2, 3: 0}

    def test_earliest_anchor_maximizes_completion(self, spark):
        # Two signups; only the EARLIER one admits the click between
        # them. Anchoring at min(signup) is what finds the completion.
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T00:30", "click"),
                (1, "2024-01-01T01:00", "signup"),
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES)) == {1: 2}

    def test_strictly_after_excludes_ties(self, spark):
        # click exactly AT the signup instant does not count (> not >=).
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T00:00", "click"),
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES)) == {1: 1}

    def test_stage_ts_is_deepest(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T01:00", "click"),
            ],
        )
        row = funnel_stages(e, self.STAGES).collect()[0]
        assert row["funnel_stage"] == 2
        assert row["stage_ts"] == _t("2024-01-01T01:00")

    def test_stage0_user_has_null_ts(self, spark):
        e = _events(spark, [(1, "2024-01-01T00:00", "view")])
        row = funnel_stages(e, self.STAGES).collect()[0]
        assert row["funnel_stage"] == 0 and row["stage_ts"] is None

    def test_empty_stages_rejected(self, spark):
        e = _events(spark, [(1, "2024-01-01T00:00", "signup")])
        with pytest.raises(ValueError, match="stages"):
            funnel_stages(e, ())

    def test_single_stage(self, spark):
        e = _events(
            spark,
            [(1, "2024-01-01T00:00", "signup"), (2, "2024-01-01T00:00", "view")],
        )
        assert _stages(funnel_stages(e, ("signup",))) == {1: 1, 2: 0}


class TestFunnelHorizon:
    STAGES = ("signup", "click", "purchase")

    def test_gap_excludes_late_conversion(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T00:30", "click"),      # inside 1h window
                (2, "2024-01-01T00:00", "signup"),
                (2, "2024-01-01T02:00", "click"),      # outside 1h window
            ],
        )
        got = _stages(funnel_stages(e, self.STAGES, max_gap_seconds=3600))
        assert got == {1: 2, 2: 1}

    def test_gap_boundary_inclusive(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T01:00", "click"),  # exactly at the bound
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES, max_gap_seconds=3600)) == {1: 2}

    def test_greedy_anchor_caveat(self, spark):
        # Documented greedy semantic: the MIN signup anchors the window
        # even when a LATER signup would have admitted the click.
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-01-01T05:00", "signup"),
                (1, "2024-01-01T05:30", "click"),  # within 1h of signup #2 only
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES, max_gap_seconds=3600)) == {1: 1}

    def test_no_gap_equals_unbounded(self, spark):
        e = _events(
            spark,
            [
                (1, "2024-01-01T00:00", "signup"),
                (1, "2024-03-01T00:00", "click"),
            ],
        )
        assert _stages(funnel_stages(e, self.STAGES)) == {1: 2}
        assert _stages(
            funnel_stages(e, self.STAGES, max_gap_seconds=3600)
        ) == {1: 1}
