"""Randomized KLL rank-contract sweep (r11 depth): the fixture tests
in test_sketch.py check the 0.05 rank-error contract on the sf0.01
events distribution only. This sweep feeds ADVERSARIAL seeded value
distributions — heavy ties, constants, bimodal gaps, lognormal-ish
skew, integer quantization — through both the cascade and the direct
form under random partitionings, asserting the same contract. KLL is
randomized internally, so the contract (not bit-equality) is the only
cross-form assertion available; what this adds over the fixture test
is that the bound holds where quantile sketches classically hurt
(ties and atoms concentrate rank mass on single values).

Rank error here is the one-sided CDF form the fixture test uses:
|P(value <= estimate) - q|. With heavy ties this is the HARSHER
definition (an atom at the quantile can carry >5% mass, and any
estimate inside the atom still resolves to the atom's full CDF mass),
so ties-heavy trials assert a relaxed bound of atom_mass + 0.05
instead — the sketch cannot beat the distribution's own granularity.

Failures print the seed; SPARK_GRAFT_KLL_SEED=<seed> reproduces.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

# r14 tiering (VERDICT r13 #2): multi-seed randomized sweep — slow
# tier, opt in with SPARK_GRAFT_SLOW=1 (run + recorded in COVERAGE.md
# each round).
pytestmark = pytest.mark.slow

from salesforce_postgresql_etl_spark.operators.sketch import (
    quantile_cascade,
    quantile_direct,
)

_SEEDS = (
    [int(os.environ["SPARK_GRAFT_KLL_SEED"])]
    if os.environ.get("SPARK_GRAFT_KLL_SEED")
    else [31, 677, 14939]
)

_BASE = dt.datetime(2025, 5, 1, 0, 0, 0)


def _draw(rng: random.Random, dist: str) -> float:
    if dist == "ties":  # 10 atoms, huge mass each
        return float(rng.randint(0, 9))
    if dist == "constant":
        return 42.0
    if dist == "bimodal":  # two clusters with a void between
        return rng.gauss(-1000.0, 1.0) if rng.random() < 0.5 else rng.gauss(
            1000.0, 1.0
        )
    if dist == "lognormal":
        return rng.lognormvariate(0.0, 2.0)
    if dist == "quantized":  # integer cents
        return rng.randint(-5000, 5000) / 100.0
    raise AssertionError(dist)


def _corpus(spark, rng: random.Random, dist: str):
    rows = []
    for i in range(rng.randint(1200, 3000)):
        ts = _BASE + dt.timedelta(
            days=rng.randint(0, 1),
            minutes=rng.uniform(0, 1439),
        )
        rows.append(
            (i, ts, rng.choice(["click", "view"]), _draw(rng, dist))
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    ).repartition(rng.randint(1, 16))


def _rank_errors(est_df, raw_df):
    from pyspark.sql import functions as F

    raw = raw_df.select(
        F.date_trunc("day", "ts").alias("day"), "event_type", "value"
    )
    j = raw.join(est_df, ["day", "event_type"])
    aggs = [
        (
            F.sum(F.when(F.col("value") <= F.col(col), 1).otherwise(0))
            / F.count(F.lit(1))
            - F.lit(q)
        ).alias(f"err_{col}")
        for col, q in (("q50_est", 0.5), ("q90_est", 0.9))
    ]
    rows = j.groupBy("day", "event_type").agg(*aggs).collect()
    return [
        abs(r[f"err_{c}"]) for r in rows for c in ("q50_est", "q90_est")
    ]


@pytest.mark.parametrize("seed", _SEEDS)
def test_kll_contract_adversarial_distributions(spark, seed):
    rng = random.Random(seed)
    dists = ["ties", "constant", "bimodal", "lognormal", "quantized"]
    rng.shuffle(dists)
    for dist in dists[:3]:  # 3 distributions per seed keeps wall bounded
        raw = _corpus(spark, rng, dist)
        raw.cache()
        try:
            # atomic distributions: the CDF-form error cannot beat the
            # largest atom's own probability mass
            bound = 0.05
            if dist in ("ties", "constant", "quantized"):
                from pyspark.sql import functions as F

                n = raw.count()
                top_atom = (
                    raw.groupBy("value").count().agg(F.max("count")).first()[0]
                )
                bound = top_atom / n + 0.05
            for form in (quantile_cascade, quantile_direct):
                errs = _rank_errors(form(raw), raw)
                assert errs, f"seed={seed} dist={dist}: no groups"
                assert max(errs) <= bound, (
                    f"seed={seed} dist={dist} form={form.__name__}: "
                    f"max rank err {max(errs):.4f} > bound {bound:.4f} "
                    f"(reproduce with SPARK_GRAFT_KLL_SEED={seed})"
                )
        finally:
            raw.unpersist()
