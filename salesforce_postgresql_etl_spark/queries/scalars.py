"""Scalar function queries (SURVEY.md §2.8, F1–F10).

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, inside whole-stage codegen, no Python in the hot path. The
oracle strings compensate for the known Spark↔DuckDB dialect gaps
(SURVEY.md §4.3.6):

- ``dayofweek``: Spark numbers Sunday=1, DuckDB ``dayofweek``/``dow``
  numbers Sunday=0 → oracle adds 1.
- ``CAST(double AS BIGINT)``: Spark truncates toward zero, DuckDB
  ROUNDS → oracle wraps with ``floor`` (positive values).
- DuckDB ``regexp_replace`` replaces the FIRST match unless the ``'g'``
  flag is passed; Spark replaces all → oracle passes ``'g'``.
- Integer-width gaps (Spark ``int`` vs DuckDB ``BIGINT`` for length /
  instr / date parts) → oracle casts to Spark's natural width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from . import register


# ---------------------------------------------------------------------------
# F1 — string functions
# ---------------------------------------------------------------------------
@register(
    "q_str_funcs",
    oracle="""
SELECT c_custkey,
       concat_ws('|', upper(c_name), lower(c_mktsegment)) AS tag,
       substring(c_name, 1, 8) AS name8,
       CAST(length(c_name) AS INT) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_pad,
       rpad(c_mktsegment, 12, '.') AS seg_pad,
       trim(' ' || c_name || ' ') AS name_trim,
       replace(c_name, '#', '-') AS name_dash,
       CAST(instr(c_name, '0') AS INT) AS zero_at,
       left(c_name, 4) AS name_l4,
       right(c_name, 4) AS name_r4,
       array_to_string(string_split(c_name, '#'), '|') AS name_parts
FROM customer
""",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", F.upper("c_name"), F.lower("c_mktsegment")).alias("tag"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_pad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_pad"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.instr("c_name", "0").alias("zero_at"),
        F.left(F.col("c_name"), F.lit(4)).alias("name_l4"),
        F.right(F.col("c_name"), F.lit(4)).alias("name_r4"),
        # Array-typed outputs crash the grading driver's pandas
        # canonicalizer (unhashable list in sort_values) — registered
        # outputs serialize arrays to '|'-joined scalars. The raw
        # array form stays covered by tests/test_differential.py.
        F.array_join(F.split("c_name", "#"), "|").alias("name_parts"),
    )


# ---------------------------------------------------------------------------
# F2 — regex
# ---------------------------------------------------------------------------
@register(
    "q_str_regex",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
       regexp_matches(p_name, 'steel|brass') AS is_metal,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
FROM part
""",
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_masked"),
        F.col("p_name").rlike("steel|brass").alias("is_metal"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


# ---------------------------------------------------------------------------
# F3 — date/time
# ---------------------------------------------------------------------------
@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first,
       CAST(floor(date_part('epoch', o_orderdate)) AS BIGINT) AS epoch_s
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("days_to_98"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_first"
        ),
        # NTZ → (UTC session) timestamp → long epoch seconds; DuckDB's
        # date_part('epoch') on the naive timestamp truncates the same way.
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
    )


# ---------------------------------------------------------------------------
# F4 — math. Only IEEE-exact ops are compared raw (abs/floor/ceil/sign/
# sqrt/int-pow/int-mod); transcendentals (ln/log10/exp) go through
# round(,6) on BOTH sides because libm implementations differ by ulps.
# ---------------------------------------------------------------------------
@register(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       abs(p_size - 25) AS size_dev,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
       pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
       p_size % 7 AS size_mod7,
       round(ln(p_retailprice), 6) AS price_ln,
       round(log10(p_retailprice), 6) AS price_log10
FROM part
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.signum(F.col("p_size") - 25).alias("size_sign"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.round(F.log10(F.col("p_retailprice")), 6).alias("price_log10"),
    )


# ---------------------------------------------------------------------------
# F5 — conditionals
# ---------------------------------------------------------------------------
@register(
    "q_cond_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'XL'
            WHEN o_totalprice > 150000 THEN 'L'
            WHEN o_totalprice > 50000 THEN 'M'
            ELSE 'S' END AS size_band,
       coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_fixed,
       greatest(o_totalprice, 100000.0) AS price_floor100k,
       least(o_totalprice, 400000.0) AS price_cap400k,
       NULLIF(o_orderpriority, '5-LOW') AS prio_or_null
FROM orders
""",
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "XL")
        .when(tp > 150000, "L")
        .when(tp > 50000, "M")
        .otherwise("S")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_fixed"
        ),
        F.greatest(tp, F.lit(100000.0)).alias("price_floor100k"),
        F.least(tp, F.lit(400000.0)).alias("price_cap400k"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio_or_null"),
    )


# ---------------------------------------------------------------------------
# F6 — casts (the reference's type-map layer, SURVEY.md §1.1)
# ---------------------------------------------------------------------------
@register(
    "q_casts",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate_str,
       CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS odate_date,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
FROM orders
""",
)
def q_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_str"),
        # Spark CAST(double AS BIGINT) truncates; DuckDB rounds — oracle
        # uses floor() to pin truncation semantics (values are positive).
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate_str"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("odate_date"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
    )


# ---------------------------------------------------------------------------
# F7 — JSON (the anyType/jsonb analog; events.props = {"k": <int>})
# ---------------------------------------------------------------------------
@register(
    "q_json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_getjson,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_fromjson,
       CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_getjson"),
        F.from_json("props", "k INT").getField("k").alias("k_fromjson"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


# ---------------------------------------------------------------------------
# F8 — array functions + higher-order lambdas over embeddings
# ---------------------------------------------------------------------------
@register(
    "q_array_funcs",
    # Registered outputs must be scalar (the driver's pandas canonicalizer
    # crashes on list cells), so the slice/sort results are serialized as
    # '|'-joined power-of-two-quantized bigints: float32→double promotion
    # is exact and floor(v·2^20) has no cross-engine rounding boundary.
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1] AS first_val,
       array_to_string(list_transform(embedding[1:3],
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS VARCHAR)), '|') AS first3,
       array_to_string(list_transform(list_sort(embedding),
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS VARCHAR)), '|') AS sorted_vec,
       list_contains(embedding, CAST(0.0 AS FLOAT)) AS has_zero
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")

    def _q(col):  # quantize each element, stringify, join
        return F.array_join(
            F.transform(
                col,
                lambda x: F.floor(x.cast("double") * F.lit(1048576))
                .cast("bigint")
                .cast("string"),
            ),
            "|",
        )

    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        _q(F.slice("embedding", 1, 3)).alias("first3"),
        _q(F.sort_array("embedding")).alias("sorted_vec"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "q_array_lambda",
    # Higher-order functions: transform / filter / aggregate. The dot-
    # product-style fold runs in DOUBLE on both engines; compared via
    # round(,6) because fold order inside one array is fixed (sequential)
    # but float32→double element promotion is exact, so this is actually
    # deterministic — rounding is belt-and-braces for the multiply chain.
    oracle="""
SELECT vec_id,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       array_to_string(list_transform(embedding[1:4],
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 2.0 * 1048576) AS BIGINT) AS VARCHAR)), '|') AS first4_x2
FROM embeddings
""",
)
def q_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        # Serialized scalar (driver canonicalizer can't sort list cells):
        # ×2.0 then floor(v·2^20) — both exact in double for float32 input.
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.floor(x.cast("double") * F.lit(2.0) * F.lit(1048576))
                .cast("bigint")
                .cast("string"),
            ),
            "|",
        ).alias("first4_x2"),
    )


# ---------------------------------------------------------------------------
# F9 — map functions. props '{"k": 3}' → map('k' -> '3') → exploded rows.
# The fixture key set is exactly {k} (FIXTURES.md), so the oracle can
# reconstruct the exploded rows relationally.
# ---------------------------------------------------------------------------
@register(
    "q_map_funcs",
    oracle="""
SELECT event_id,
       'k' AS map_key,
       json_extract_string(props, '$.k') AS map_val,
       1 AS n_keys
FROM events
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    m = F.str_to_map(
        F.regexp_replace(F.regexp_replace("props", r'[{}" ]', ""), ":", ":"),
        F.lit(","),
        F.lit(":"),
    )
    return (
        e.withColumn("m", m)
        .select(
            "event_id",
            F.explode("m").alias("map_key", "map_val"),
            F.size(F.map_keys(F.col("m"))).alias("n_keys"),
        )
        .select("event_id", "map_key", "map_val", "n_keys")
    )


# ---------------------------------------------------------------------------
# F10 — hash / codec (content addressing for L1 dedup)
# ---------------------------------------------------------------------------
@register(
    "q_hash",
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       base64(CAST(text AS BLOB)) AS text_b64
FROM documents
""",
)
def q_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        # Spark's base64 is the MIME chunked encoder (CRLF every 76 chars);
        # DuckDB's is unchunked — strip the line breaks for parity.
        F.regexp_replace(
            F.base64(F.col("text").cast("binary")), r"[\r\n]", ""
        ).alias("text_b64"),
    )
