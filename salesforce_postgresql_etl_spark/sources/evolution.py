"""Schema-evolution conformance reads.

A long-lived extract directory never has ONE schema: upstream adds a
column, drops one, widens an int — and 100 TB of already-landed files
are not getting rewritten. The engine's contract (proven for the
events.ts µs/ns change in tables.py) is: read every vintage, conform
to the CURRENT declared schema.

Spark's own ``mergeSchema`` refuses exactly the interesting case — a
column that WIDENED between vintages (int files + bigint files →
CANNOT_MERGE_SCHEMAS) — so ``read_conformed`` resolves the glob to
vintage directories (Hadoop FS globStatus: works on HDFS/S3 paths,
not just local), reads each vintage with its own schema, conforms
each to the target, and unions by name. Per-column conformance:
- missing column → typed NULL (parquet's own missing-column
  semantics, made explicit and total);
- extra columns → dropped (they belong to a future schema version);
- type drift → cast, but only WIDENING casts (the ``_widens`` lattice:
  int→long, float→double, int→double, decimal growth); a narrowing
  mismatch raises instead of silently truncating data.

At 100 TB the per-vintage plans matter: each vintage keeps its own
pushed-down scan (filters/pruning apply per file group), and the
union is plan-level — no data moves to reconcile schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Keys are DataType.simpleString() SQL names (int, bigint, ...).
_WIDENS: dict[tuple[str, str], bool] = {}
for _small, _bigs in {
    "tinyint": ("smallint", "int", "bigint", "float", "double"),
    "smallint": ("int", "bigint", "float", "double"),
    "int": ("bigint", "float", "double"),
    "bigint": ("double",),
    "float": ("double",),
    "date": ("timestamp", "timestamp_ntz"),
}.items():
    for _b in _bigs:
        _WIDENS[(_small, _b)] = True


def _conformable(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # Decimal widening: no loss iff both precision headroom and
        # scale grow together.
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    return _WIDENS.get((src.simpleString(), dst.simpleString()), False)


def _conform_one(raw: DataFrame, target: T.StructType, vintage: str) -> DataFrame:
    have = {f.name: f.dataType for f in raw.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif _conformable(have[f.name], f.dataType):
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"column {f.name!r} in vintage {vintage}: cannot conform "
                f"{have[f.name].simpleString()} to {f.dataType.simpleString()} "
                "without narrowing — refusing to truncate data silently"
            )
    return raw.select(*cols)


def _glob(spark: SparkSession, pattern: str) -> list[str]:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    statuses = fs.globStatus(p)
    if not statuses:
        raise FileNotFoundError(f"no vintages match {pattern!r}")
    return sorted(s.getPath().toString() for s in statuses)


def read_conformed(
    spark: SparkSession, paths: str | list[str], target_schema: str
) -> DataFrame:
    """Read multi-vintage parquet conformed to ``target_schema`` (a
    DDL string — the CURRENT table contract). ``paths``: a glob whose
    matches are the vintage directories, or an explicit list."""
    target = T.StructType.fromDDL(target_schema)
    vintages = _glob(spark, paths) if isinstance(paths, str) else list(paths)
    out = None
    for v in vintages:
        conformed = _conform_one(spark.read.parquet(v), target, v)
        out = conformed if out is None else out.unionByName(conformed)
    return out
