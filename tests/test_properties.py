"""Property-based spot checks (SURVEY.md §5.2.4) — hypothesis drives
small generated inputs through the real operators on Spark.

Kept deliberately small (max_examples) since each example pays a Spark
job; the properties target algebraic laws the differential can't see.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.dedup import neardup_pairs

_settings = settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@given(docs=st.lists(_doc, min_size=2, max_size=6))
@_settings
def test_dedup_hash_idempotent(spark, docs):
    # dedup(dedup(x)) == dedup(x): grouping by content hash once removes
    # every duplicate — a second pass must be the identity.
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    once = (
        df.withColumn("h", F.md5(F.lower(F.trim("text"))))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    twice = once.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(docs=st.lists(_doc, min_size=2, max_size=5))
@_settings
def test_jaccard_bounds_and_self_similarity(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    pairs = neardup_pairs(df, threshold=0.0, strategy="brute").collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b
    # identical docs ⇒ jaccard exactly 1
    dup = spark.createDataFrame(
        [(0, docs[0]), (1, docs[0])], "doc_id long, text string"
    )
    [r] = neardup_pairs(dup, threshold=0.0, strategy="brute").collect()
    assert r.jaccard == 1.0


@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20),
    ys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20),
)
@_settings
def test_union_all_count_additivity(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs], "v int")
    b = spark.createDataFrame([(y,) for y in ys], "v int")
    assert a.unionByName(b).count() == len(xs) + len(ys)


# ----------------------------- r5d properties ------------------------------

_EVT = st.sampled_from(["signup", "click", "purchase", "view"])
_TS = st.integers(min_value=0, max_value=50)  # minutes past a fixed epoch


def _events_df(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (u, base + dt.timedelta(minutes=m), t)
            for (u, m, t) in rows
        ],
        "user_id long, ts timestamp_ntz, event_type string",
    )


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), _TS, _EVT), min_size=1, max_size=10
    ),
    extra=st.tuples(st.integers(1, 3), _TS, _EVT),
)
@_settings
def test_funnel_stage_monotone_under_more_events(spark, rows, extra):
    # Adding an event can only relax stage anchors (each anchor is a
    # MIN over a superset), so no user's funnel stage may decrease.
    from salesforce_postgresql_etl_spark.operators.funnel import funnel_stages

    stages = ("signup", "click", "purchase")
    before = {
        r["user_id"]: r["funnel_stage"]
        for r in funnel_stages(_events_df(spark, rows), stages).collect()
    }
    after = {
        r["user_id"]: r["funnel_stage"]
        for r in funnel_stages(_events_df(spark, [*rows, extra]), stages).collect()
    }
    for u, s in before.items():
        assert after[u] >= s


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 2), _TS, st.integers(0, 1000)),
        min_size=2,
        max_size=10,
    )
)
@_settings
def test_twa_bounded_by_min_max(spark, rows):
    # A time-weighted average is a convex combination of the observed
    # values: min(v) <= twa <= max(v) for every user with >= 2 distinct
    # event times.
    import datetime as dt

    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (u, base + dt.timedelta(minutes=m), i, v / 10.0)
            for i, (u, m, v) in enumerate(rows)
        ],
        "user_id long, ts timestamp_ntz, event_id long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = df.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (
            F.lead(F.col("ts").cast("timestamp").cast("long")).over(w)
            - F.col("ts").cast("timestamp").cast("long")
        ).alias("dt"),
    ).where(F.col("dt").isNotNull() & (F.col("dt") > 0))
    twa = iv.groupBy("user_id").agg(
        (
            (F.sum(F.col("v") * F.col("dt")) * F.lit(100)).cast("bigint")
            / (F.sum("dt") * F.lit(100))
        ).alias("twa"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    for r in twa.collect():
        assert float(r["lo"]) - 1e-9 <= r["twa"] <= float(r["hi"]) + 1e-9


@given(
    olds=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), max_size=8),
    news=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), max_size=8),
)
@_settings
def test_cdc_roundtrip_property(spark, olds, news):
    # apply(old, diff(old, new)) == new for ANY pair of keyed tables
    # (last writer wins per key to make the inputs well-formed).
    from salesforce_postgresql_etl_spark.operators.cdc import (
        apply_changes,
        snapshot_diff,
    )

    def mk(rows):
        dedup = {k: v for k, v in rows}
        return spark.createDataFrame(
            [(k, v) for k, v in dedup.items()] or [(999, 0)], "id long, v long"
        )

    old, new = mk(olds), mk(news)
    feed = snapshot_diff(old, new, ["id"], include_values=True)
    rebuilt = apply_changes(old, feed, ["id"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


_px = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_bmp_codec_roundtrip_property(w, h, data):
    # decode(encode(px)) == px for ANY dims (odd widths exercise row
    # padding) and ANY pixel values — pure Python, no Spark job, so
    # this one can afford real example counts.
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    px = [
        [data.draw(_px) for _ in range(w)] for _ in range(h)
    ]
    out = decode_bmp(encode_bmp(px))
    assert (out["width"], out["height"]) == (w, h)
    assert out["pixels"] == px


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_ppm_codec_roundtrip_property(w, h, data):
    # (r7, VERDICT r6 #4) same property as the BMP codec for the second
    # real decoder: decode(encode(px)) == px for any dims and values.
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    px = [
        [data.draw(_px) for _ in range(w)] for _ in range(h)
    ]
    out = decode_ppm(encode_ppm(px))
    assert (out["width"], out["height"]) == (w, h)
    assert out["pixels"] == px


@given(
    n_channels=st.integers(1, 3),
    n_frames=st.integers(0, 40),
    sample_rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_wav_codec_roundtrip_property(n_channels, n_frames, sample_rate, data):
    # (r7) decode(encode(s)) == s for any channel count, frame count
    # (including zero), rate, and full-range int16 values.
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = [
        data.draw(st.integers(-32768, 32767))
        for _ in range(n_frames * n_channels)
    ]
    out = decode_wav(encode_wav(samples, sample_rate, n_channels))
    assert out["samples"] == samples
    assert out["n_samples"] == n_frames
    assert out["n_channels"] == n_channels
    assert out["sample_rate"] == sample_rate


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    filter_type=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_codec_roundtrip_property(w, h, filter_type, data):
    # (r7) decode(encode(px)) == px for the COMPRESSED image codec,
    # for any dims/values and under EVERY row-filter choice — each
    # filter_type exercises a distinct _png_unfilter_row branch
    # (including the sequential left-neighbor reconstruction).
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = [
        [data.draw(_px) for _ in range(w)] for _ in range(h)
    ]
    out = decode_png(encode_png(px, filter_type=filter_type))
    assert (out["width"], out["height"], out["channels"]) == (w, h, 3)
    assert out["pixels"] == px


@given(
    n_channels=st.integers(1, 3),
    n_frames=st.integers(0, 30),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_wav_ulaw_quantization_property(n_channels, n_frames, data):
    # (r7) μ-law is LOSSY, so the property is the G.711 contract, not
    # byte equality: within the codec's representable range (±32124 =
    # the max decodable magnitude) every decoded sample sits within the
    # top-segment half-step (512) of its source; beyond it the codec
    # SATURATES to ±32124. Re-companding a decoded stream is exact
    # (expand∘compress idempotent on the image).
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        linear_to_ulaw,
        ulaw_to_linear,
    )

    samples = [
        data.draw(st.integers(-32768, 32767))
        for _ in range(n_frames * n_channels)
    ]
    out = decode_wav(encode_wav(samples, 8000, n_channels, codec="ulaw"))
    assert out["codec"] == "ulaw" and out["n_samples"] == n_frames
    for d, s in zip(out["samples"], samples):
        if abs(s) <= 32124:
            assert abs(d - s) <= 512
        else:
            assert d == (32124 if s > 0 else -32124)
    assert [ulaw_to_linear(linear_to_ulaw(d)) for d in out["samples"]] == (
        out["samples"]
    )


@given(
    docs=st.lists(_doc, min_size=2, max_size=8),
    split=st.integers(min_value=1, max_value=6),
)
@_settings
def test_stored_bands_parity_property(spark, docs, split):
    """Stored-signature search ≡ re-hash for ARBITRARY corpora, not
    just the curated fixture: band_signatures is a pure function of
    its input rows, so materializing it can never change the pair set
    (the invariant the streaming ingest's correctness rests on)."""
    from salesforce_postgresql_etl_spark.operators.dedup import (
        band_signatures,
        neardup_pairs_cross,
    )

    rows = [(i, d) for i, d in enumerate(docs)]
    k = min(split, len(rows) - 1)
    corpus = spark.createDataFrame(rows[:k], "doc_id long, text string")
    new = spark.createDataFrame(
        [(i + 1000, d) for i, d in rows[k:]], "doc_id long, text string"
    )
    kw = {"threshold": 0.5, "n_hashes": 16, "bands": 8}
    rehash = sorted(
        tuple(r)
        for r in neardup_pairs_cross(new, corpus, strategy="minhash", **kw).collect()
    )
    stored = sorted(
        tuple(r)
        for r in neardup_pairs_cross(
            new,
            corpus,
            strategy="minhash",
            corpus_bands=band_signatures(
                corpus, n_hashes=kw["n_hashes"], bands=kw["bands"]
            ),
            **kw,
        ).collect()
    )
    assert rehash == stored
