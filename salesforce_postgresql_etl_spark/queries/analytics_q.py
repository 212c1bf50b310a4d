"""Product-analytics queries: funnel, cohort retention, time-weighted
average. Round-5d additions, tail-registered (after the r5 graded
window) per the rotation ledger in COVERAGE.md.

These are the workhorse event-analytics shapes a user of a
Salesforce-sync warehouse actually runs on the synced tables
(SURVEY.md §3.1 entry point 3 generalized from row-count
reconciliation to real analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.funnel import funnel_stages
from ..sources import load
from . import register

# ---------------------------------------------------------------------------
# Funnel: signup -> click -> purchase, earliest-completion semantics.
# Oracle mirrors the stage-anchored MIN chain with sequential CTEs.
# ---------------------------------------------------------------------------
FUNNEL_STAGES = ("signup", "click", "purchase")


@register(
    "q_funnel",
    oracle="""
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_stage,
       COALESCE(t3, t2, t1) AS stage_ts
FROM u LEFT JOIN s1 USING (user_id)
       LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return funnel_stages(e, FUNNEL_STAGES)


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen day; for each (cohort
# day, day offset) the count of cohort members active that day. One
# extra shuffle beyond the activity dedup (cohort join is on user_id,
# same key as the first aggregation -> partitioning reuse; the final
# (cohort, offset) agg is over a frame already reduced to
# user-day granularity, ~1000x smaller than raw events at any scale).
# ---------------------------------------------------------------------------
@register(
    "q_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS act_day
  FROM events)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.act_day) AS INT) AS day_offset,
       COUNT(*) AS n_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("act_day")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_day", F.datediff("act_day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Time-weighted average of `value` per user over irregular event times:
# each reading holds until the next one; TWA = sum(value * dt) / sum(dt).
# Determinism doctrine (functions/determinism.py): value is quantized to
# DECIMAL(18,2) and dt is integer seconds, so sum(value*dt) is an exact
# decimal; x100 -> bigint is exact; the final bigint/bigint division is
# ONE correctly-rounded IEEE op in both engines -> bit-identical double.
# Scale shape: one window (partitioned by user) + one agg on the same
# key; no single-partition frames.
# ---------------------------------------------------------------------------
@register(
    "q_twa",
    oracle="""
WITH iv AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2)) AS v,
         CAST(date_diff('second', ts,
              LEAD(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) AS BIGINT) AS dt
  FROM events)
SELECT user_id,
       CAST(SUM(v * dt) * 100 AS BIGINT)
         / (CAST(SUM(dt) AS BIGINT) * 100) AS twa,
       CAST(SUM(dt) AS BIGINT) AS total_s
FROM iv WHERE dt IS NOT NULL
GROUP BY user_id
""",
)
def q_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        # ntz won't cast straight to bigint in Spark 4; hop through
        # timestamp (session tz pinned UTC -> same epoch second, and the
        # cast floors sub-seconds exactly like DuckDB's date_diff
        # boundary count).
        (
            F.lead(F.col("ts").cast("timestamp").cast("long")).over(w)
            - F.col("ts").cast("timestamp").cast("long")
        ).alias("dt"),
    ).where(F.col("dt").isNotNull())
    return iv.groupBy("user_id").agg(
        (
            (F.sum(F.col("v") * F.col("dt")) * F.lit(100)).cast("bigint")
            / (F.sum("dt") * F.lit(100))
        ).alias("twa"),
        F.sum("dt").alias("total_s"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (r5d): for each purchase, the most recent
# preceding touch event (click/view/signup) by the same user — the
# classic marketing-attribution shape, and a composition showcase for
# the as-of bucket-merge operator (operators/asof.py: one shuffle,
# running last(... ignore nulls), zero pair materialization). The
# oracle is the band-join + row_number form with the same tiebreak
# (greatest touch event_id among equal ts).
# ---------------------------------------------------------------------------
from ..operators.asof import asof_backward_join  # noqa: E402

_TOUCH_TYPES = ("click", "view", "signup")


@register(
    "q_attribution",
    oracle="""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT event_id AS touch_id, user_id, ts AS touch_ts,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view', 'signup')),
j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts,
             t.touch_id, t.touch_ts, t.touch_type,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY t.touch_ts DESC, t.touch_id DESC)
               AS rn
      FROM p LEFT JOIN t
        ON p.user_id = t.user_id AND t.touch_ts <= p.purchase_ts)
SELECT purchase_id, user_id, purchase_ts, touch_id, touch_ts, touch_type
FROM j WHERE rn = 1
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    touches = e.where(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch_type"),
    )
    return asof_backward_join(
        purchases,
        touches,
        ["user_id"],
        "purchase_ts",
        "touch_ts",
        tiebreak="touch_id",
    ).select(
        "purchase_id", "user_id", "purchase_ts",
        "touch_id", "touch_ts", "touch_type",
    )


# ---------------------------------------------------------------------------
# Robust outlier detection via MAD (r5d): median / median-absolute-
# deviation are the robust location/scale pair (unlike mean/stddev they
# ignore the outliers being hunted). Two median passes (grouped median
# is exact two-phase in both engines — q_agg_median proved the
# interpolation parity), deviations are exact double subtractions, and
# the 4.4478 = 3 * 1.4826 (normal-consistency) threshold is a literal
# on both sides so the comparison is bit-deterministic.
# ---------------------------------------------------------------------------
@register(
    "q_mad_outliers",
    oracle="""
WITH med AS (SELECT event_type, median(value) AS med FROM events
             GROUP BY event_type),
dev AS (SELECT e.event_type, med.med, abs(e.value - med.med) AS dev
        FROM events e JOIN med USING (event_type)),
mad AS (SELECT event_type, med, median(dev) AS mad FROM dev
        GROUP BY event_type, med)
SELECT d.event_type, m.med, m.mad,
       CAST(SUM(CASE WHEN d.dev > 4.4478 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       COUNT(*) AS n
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type, m.med, m.mad
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type", "med").agg(F.median("dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med_"),
            F.first("mad").alias("mad_"),
            F.sum(
                F.when(F.col("dev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("med_").alias("med"),
            F.col("mad_").alias("mad"),
            "n_outliers",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Calendar-spine gap filling (r5d): hourly purchase counts with missing
# hours materialized as zero rows — the dense time series every
# dashboard/forecast consumer expects, built from a generated spine
# (sequence/generate_series), not from the sparse data itself. The
# bounds aggregate is a deliberate 1-row funnel (allowlisted); the
# spine explode is ~thousands of rows regardless of data scale, and
# the fill join is broadcast-sized on the spine side.
# ---------------------------------------------------------------------------
@register(
    "q_gap_fill",
    oracle="""
WITH p AS (SELECT date_trunc('hour', ts) AS hr FROM events
           WHERE event_type = 'purchase'),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM p),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
          FROM b),
cnt AS (SELECT hr, COUNT(*) AS n FROM p GROUP BY hr)
SELECT CAST(spine.hr AS TIMESTAMP) AS hour, COALESCE(cnt.n, 0) AS n
FROM spine LEFT JOIN cnt ON spine.hr = cnt.hr
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.date_trunc("hour", "ts").alias("hr")
    )
    bounds = p.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    cnt = p.groupBy(F.col("hr").alias("hour")).agg(F.count(F.lit(1)).alias("n"))
    return spine.join(cnt, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).alias("n")
    )


# ---------------------------------------------------------------------------
# Forward as-of (r5d): for each purchase, the EARLIEST click at-or-
# after it — "time to next event". Driver-grades the forward merge
# operator directly (operators/asof.py asof_forward_join: one shuffle,
# descending-ts running last); oracle is the forward band join with the
# mirrored tiebreak (smallest click id among equal ts).
# ---------------------------------------------------------------------------
from ..operators.asof import asof_forward_join  # noqa: E402


@register(
    "q_asof_forward",
    oracle="""
WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS c_id, ts AS c_ts FROM events
           WHERE event_type = 'click'),
     j AS (SELECT p.user_id, p.p_id, p.p_ts, c.c_id, c.c_ts,
                  ROW_NUMBER() OVER (PARTITION BY p.p_id
                                     ORDER BY c.c_ts ASC, c.c_id ASC) AS rn
           FROM p LEFT JOIN c
             ON p.user_id = c.user_id AND c.c_ts >= p.p_ts)
SELECT user_id, p_id, p_ts, c_id AS next_click_id, c_ts AS next_click_ts
FROM j WHERE rn = 1
""",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("next_click_id"),
        F.col("ts").alias("next_click_ts"),
    )
    return asof_forward_join(
        p, c, ["user_id"], "p_ts", "next_click_ts", tiebreak="next_click_id"
    ).select("user_id", "p_id", "p_ts", "next_click_id", "next_click_ts")


# ---------------------------------------------------------------------------
# Triangle counting (r5d): cohesion of the near-dup graph (triangle-
# dense clusters = true duplicate families; triangle-free pair chains =
# LSH borderline noise). Spark side is the degree-ordered node-iterator
# (orient every edge from (deg,id)-lower to higher endpoint, join
# wedges at the low vertex, semi-join the closing edge) — the classic
# distributed-triangle trick that bounds per-vertex wedge fan-out by
# O(sqrt(m)) instead of max-degree², so hub nodes can't blow up the
# wedge join at 100 TB. The oracle counts u<v<w triples directly.
# ---------------------------------------------------------------------------
from ..operators.clustering import dedup_clusters  # noqa: E402
from ..operators.dedup import neardup_pairs  # noqa: E402
from .llm import NEARDUP_THRESHOLD  # noqa: E402


@register(
    "q_triangles",
    oracle=f"""
WITH tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
             FROM documents),
p AS (SELECT a.doc_id AS u, b.doc_id AS v
      FROM tok a JOIN tok b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            / CAST(len(a.t) + len(b.t)
                   - len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            >= {NEARDUP_THRESHOLD}),
nodes AS (SELECT u AS n FROM p UNION SELECT v FROM p),
tri AS (SELECT COUNT(*) AS n_triangles
        FROM p ab JOIN p ac ON ab.u = ac.u AND ab.v < ac.v
                  JOIN p bc ON bc.u = ab.v AND bc.v = ac.v)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM p) AS n_edges,
       tri.n_triangles
FROM tri
""",
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    e = (
        neardup_pairs(d, threshold=NEARDUP_THRESHOLD, strategy="brute")
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .distinct()
    )
    # degree over the undirected graph
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge from (deg,id)-lower to (deg,id)-higher endpoint
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    withdeg = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("ddeg").alias("db")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("c"), F.col("ddeg").alias("dc")
    )
    wedges = e1.join(e2, "src").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    # lazy 1-row side aggregates (no eager driver jobs at build time),
    # assembled dq_report-style via broadcast crosses
    nodes_cnt = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges_cnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(nodes_cnt))
        .crossJoin(F.broadcast(edges_cnt))
        .select("n_nodes", "n_edges", "n_triangles")
    )


# ---------------------------------------------------------------------------
# Windowed funnel (r5d): the conversion-window variant — each stage
# counts only within 48h of the previous stage's anchor (greedy
# min-anchor semantics, the standard product-analytics definition;
# see the operator docstring for the non-optimality caveat the oracle
# deliberately shares).
# ---------------------------------------------------------------------------
_FUNNEL_GAP_S = 48 * 3600


@register(
    "q_funnel_horizon",
    oracle=f"""
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
              AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_GAP_S} SECONDS
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
              AND e.ts <= s2.t2 + INTERVAL {_FUNNEL_GAP_S} SECONDS
       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_stage,
       COALESCE(t3, t2, t1) AS stage_ts
FROM u LEFT JOIN s1 USING (user_id)
       LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
""",
)
def q_funnel_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return funnel_stages(e, FUNNEL_STAGES, max_gap_seconds=_FUNNEL_GAP_S)


# ---------------------------------------------------------------------------
# Quality-aware dedup survivor (r5d): RefinedWeb-style keep-best —
# near-dup clusters keep the member with the HIGHEST quality score
# (not the smallest id). Composes pairs -> connected components ->
# quality join -> per-cluster arg-max with a (quality, doc_id)
# lexicographic tiebreak. The oracle rebuilds the same fixpoint
# recursively and arg-maxes identically.
# ---------------------------------------------------------------------------
@register(
    "q_dedup_keep_best",
    oracle=f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tok a JOIN tok b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            / CAST(len(a.t) + len(b.t)
                   - len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            >= {NEARDUP_THRESHOLD}),
edges AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node),
lab AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
q AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t,
             len(string_split(text, ' ')) AS n_words
      FROM documents),
score AS (SELECT doc_id,
                 CAST(len(t) AS DOUBLE) / n_words AS quality FROM q),
m AS (SELECT lab.cluster_id, lab.doc_id, score.quality
      FROM lab JOIN score USING (doc_id))
SELECT cluster_id,
       arg_max(doc_id, quality * 10000000 + doc_id) AS keep_doc,
       CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM m GROUP BY cluster_id
""",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = neardup_pairs(d, threshold=NEARDUP_THRESHOLD, strategy="brute").select(
        "doc_a", "doc_b"
    )
    clusters = dedup_clusters(pairs).select("doc_id", "cluster_id")
    toks = F.split(F.col("text"), " ")
    score = d.select(
        "doc_id",
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("quality"),
    )
    m = clusters.join(score, "doc_id")
    # composite scalar key, identical arithmetic in the oracle: quality
    # values are rationals with denominator <= doc length (spacing
    # >= ~2.8e-4), so the doc_id/1e7 tiebreak term can never reorder
    # distinct qualities
    return m.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.col("quality") * F.lit(10000000) + F.col("doc_id")
        ).alias("keep_doc"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# Per-key linear trend (r5d): slope/intercept of daily event counts vs
# day index, per event_type — the "is this metric growing" primitive.
# Closed-form least squares over EXACT integer sums (x = day index,
# y = daily count): n, Σx, Σy, Σxy, Σx² are all integers, so both
# engines assemble identical numerators/denominators and the slope =
# num/den is ONE IEEE division — bit-deterministic without rounding.
# (Built-in regr_slope is avoided on purpose: its incremental update
# order is engine-internal and not hash-comparable.)
# ---------------------------------------------------------------------------
@register(
    "q_trend",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00',
                        date_trunc('day', ts)) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS BIGINT)
         / CAST(n * sxx - sx * sx AS BIGINT) AS slope,
       CAST(sy * sxx - sx * sxy AS BIGINT)
         / CAST(n * sxx - sx * sx AS BIGINT) AS intercept
FROM s
""",
)
def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    daily = daily.select(
        "event_type",
        F.datediff("day", F.lit("2024-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("x"),
        "y",
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("bigint")
    return s.select(
        "event_type",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("bigint")
            / den
        ).alias("slope"),
        (
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                "bigint"
            )
            / den
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Pareto / cumulative-share analysis (r5d): customers ranked by revenue
# with each one's cumulative share of the total — "which customers are
# 80% of revenue". The cumulative sum is NOT a single-partition window:
# it reuses the distributed prefix-sum machinery (operators/packing.py
# pack_bins — range repartition + per-partition sums + broadcast
# offsets; the only single-partition frame is over numPartitions rows),
# ordered by revenue DESC via the negated exact integer key. Revenue is
# exact cents (bigint), so cum_share is ONE bigint/bigint IEEE division
# — bit-deterministic, no rounding.
# ---------------------------------------------------------------------------
from ..operators.packing import pack_bins  # noqa: E402


@register(
    "q_pareto",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_custkey),
tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM rev),
c AS (SELECT o_custkey, rev_cents,
             CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents
      FROM rev)
SELECT c.o_custkey,
       CAST(c.rev_cents AS BIGINT) / 100.0 AS revenue,
       c.cum_cents / CAST(tot.total AS DOUBLE) AS cum_share,
       c.cum_cents * 10 <= tot.total * 8 AS in_top80
FROM c CROSS JOIN tot
""",
)
def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * F.lit(100))
        .cast("bigint")
        .alias("rev_cents")
    )
    rev = rev.withColumn("neg_rev", -F.col("rev_cents"))
    packed = pack_bins(
        rev,
        order_col="neg_rev",
        size_col="rev_cents",
        budget=1 << 60,  # one giant bin: we only want the offsets
        tiebreak_cols=("o_custkey",),
    )
    tot = rev.agg(F.sum("rev_cents").cast("bigint").alias("total"))
    out = packed.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        (
            (F.col("offset") + F.col("rev_cents")).cast("bigint")
            / F.col("total").cast("double")
        ).alias("cum_share"),
        # Exact integer compare (r6, advisor): CAST(0.8*total AS BIGINT)
        # rounds in DuckDB but truncates in Spark, so a cum_cents landing
        # exactly on the boundary could flip between engines. cum*10 <=
        # total*8 is the same predicate with no double cast on either
        # side (cents*10 is far below bigint range at any realistic SF).
        (
            (F.col("offset") + F.col("rev_cents")).cast("bigint") * F.lit(10)
            <= F.col("total") * F.lit(8)
        ).alias("in_top80"),
    )
    return out


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (r5d): COUNT(DISTINCT) cannot run in a
# sliding window frame in any engine — the standard rewrite reduces
# events to the (day, user) activity grid once, then joins each day to
# its trailing 7-day activity and re-counts distinct. At 100 TB the
# grid is ~users×days (already deduped, ~1000x smaller than events)
# and the day spine is broadcast-sized.
# ---------------------------------------------------------------------------
@register(
    "q_rolling_distinct",
    oracle="""
WITH act AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                    user_id FROM events),
days AS (SELECT DISTINCT d FROM act)
SELECT days.d AS day,
       CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS users_7d
FROM days JOIN act
  ON act.d <= days.d AND act.d > days.d - INTERVAL 7 DAYS
GROUP BY days.d
""",
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    act = e.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    days = act.select(F.col("d").alias("day")).distinct()
    j = F.broadcast(days).join(
        act,
        (F.col("d") <= F.col("day"))
        & (F.col("d") > F.col("day") - F.expr("INTERVAL 7 DAYS")),
    )
    return j.groupBy("day").agg(
        F.countDistinct("user_id").alias("users_7d")
    )
