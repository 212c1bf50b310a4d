"""S2 as a registered Spark 4 Python DataSource: spark.read.format("sf_model").

Pins the three load-bearing claims:
- the declared schema comes through the SF_TYPE_MAP lattice (no inference),
- each queryMore page is one input partition (parallel executor reads),
- byte-range slicing round-trips every record exactly once, typed.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json

import pytest

from salesforce_postgresql_etl_spark.sources.sf_datasource import (
    SalesforceModelDataSource,
)

FIELDS = [
    {"name": "Id", "type": "id", "nillable": False},
    {"name": "Name", "type": "string"},
    {"name": "Amount", "type": "currency"},
    {"name": "IsWon", "type": "boolean"},
    {"name": "CloseDate", "type": "date"},
    {"name": "Score", "type": "double"},
]

RECORDS = [
    {
        "Id": f"006{i:015d}",
        "Name": f"Deal {i}" if i % 7 else None,
        "Amount": round(1000.0 + 13.37 * i, 2),
        "IsWon": i % 3 == 0,
        "CloseDate": f"2026-{1 + i % 12:02d}-{1 + i % 28:02d}",
        "Score": i / 10.0,
    }
    for i in range(25)
]


@pytest.fixture(scope="module")
def jsonl(tmp_path_factory):
    p = tmp_path_factory.mktemp("sfds") / "opportunity.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS) + "\n")
    return str(p)


def _reader(spark, path, page_size):
    spark.dataSource.register(SalesforceModelDataSource)
    return (
        spark.read.format("sf_model")
        .option("describe", json.dumps(FIELDS))
        .option("path", path)
        .option("page_size", str(page_size))
        .load()
    )


def test_roundtrip_typed(spark, jsonl):
    df = _reader(spark, jsonl, page_size=4)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "string", "decimal(18,2)", "boolean", "date", "double",
    ]
    rows = sorted(df.collect(), key=lambda r: r.Id)
    assert len(rows) == len(RECORDS)
    r8 = rows[8]
    assert r8.Id == "006000000000000008"
    assert r8.Name == "Deal 8"
    assert r8.Amount == decimal.Decimal("1106.96")
    assert r8.IsWon is False
    assert r8.CloseDate == dt.date(2026, 9, 9)
    assert rows[7].Name is None  # i=7 hits the i%7==0 null arm


def test_page_per_partition(spark, jsonl):
    # 25 records / page_size 4 → 7 pages → 7 input partitions.
    df = _reader(spark, jsonl, page_size=4)
    assert df.rdd.getNumPartitions() == 7
    # exact multiple: 25/5 → 5 partitions, no empty trailing page
    assert _reader(spark, jsonl, page_size=5).rdd.getNumPartitions() == 5
    # page larger than the extract → a single page
    assert _reader(spark, jsonl, page_size=100).rdd.getNumPartitions() == 1


def test_empty_extract(spark, tmp_path):
    p = tmp_path / "empty.jsonl"
    p.write_text("")
    df = _reader(spark, str(p), page_size=10)
    assert df.count() == 0
    assert df.schema.fieldNames() == [f["name"] for f in FIELDS]


def test_pushdown_reaches_python_source(spark, jsonl):
    # Catalyst still prunes/filters above the source; the plan must show
    # the Python scan feeding a normal Filter+Project, and results match.
    df = _reader(spark, jsonl, page_size=4).filter("IsWon").select("Id", "Amount")
    got = {r.Id for r in df.collect()}
    want = {r["Id"] for r in RECORDS if r["IsWon"]}
    assert got == want


def _drain_stream_to(spark, path, sink_dir, ckpt, page_size=4):
    spark.dataSource.register(SalesforceModelDataSource)
    q = (
        spark.readStream.format("sf_model")
        .option("describe", json.dumps(FIELDS))
        .option("path", path)
        .option("page_size", str(page_size))
        .load()
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_incremental_extract(spark, tmp_path):
    """The incremental-watermark semantics as a true streaming source:
    a second drain against the same checkpoint consumes ONLY the lines
    appended since the first — planning and reading are delta-sized."""
    p = tmp_path / "stream.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS[:10]) + "\n")
    sink, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    _drain_stream_to(spark, str(p), sink, ckpt)
    assert spark.read.parquet(sink).count() == 10
    with open(p, "a") as f:
        f.write("\n".join(json.dumps(r) for r in RECORDS[10:15]) + "\n")
    _drain_stream_to(spark, str(p), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 15
    assert got.select("Id").distinct().count() == 15  # no re-delivery


def test_stream_equals_batch_typed(spark, tmp_path):
    """Full drain through the stream reader == the batch reader, typed
    row-for-row (shared _read_slice: one parse path, two transports)."""
    p = tmp_path / "full.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS) + "\n")
    sink, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    _drain_stream_to(spark, str(p), sink, ckpt)
    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    want = sorted(tuple(r) for r in _reader(spark, str(p), 4).collect())
    assert got == want


def test_stream_torn_tail_line_deferred(spark, tmp_path):
    """A partially-appended record (no newline yet) must NOT be
    consumed — latestOffset snaps to the last complete line — and must
    arrive exactly once after its newline lands."""
    p = tmp_path / "torn.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in RECORDS[:3]) + "\n")
    whole = json.dumps(RECORDS[3])
    with open(p, "a") as f:
        f.write(whole[:20])  # torn mid-record, no newline
    sink, ckpt = str(tmp_path / "landed"), str(tmp_path / "ckpt")
    _drain_stream_to(spark, str(p), sink, ckpt)
    assert spark.read.parquet(sink).count() == 3  # torn record held back
    with open(p, "a") as f:
        f.write(whole[20:] + "\n")  # the record completes
    _drain_stream_to(spark, str(p), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 4
    assert got.where(f"Id = '{RECORDS[3]['Id']}'").count() == 1
