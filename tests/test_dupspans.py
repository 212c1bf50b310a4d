"""Duplicate-span detection (operators/dupspans.py): hand-computed
semantics, the interval-union coverage math, the hash-key scale path's
exact equality with the string path, and min_count. The registered
query's differential is in test_differential.py."""

from __future__ import annotations

from salesforce_postgresql_etl_spark.operators.dupspans import (
    dup_span_positions,
    dup_span_stats,
    strip_dup_spans,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(spark, rows, k, **kw):
    out = dup_span_stats(_docs(spark, rows), k=k, **kw).orderBy("doc_id")
    return [
        (r.doc_id, r.n_spans, r.n_dup_spans, r.dup_tokens)
        for r in out.collect()
    ]


class TestDupSpanStats:
    def test_cross_doc_shared_prefix(self, spark):
        # docs 1/2 share the 4-gram "a b c d" at pos 0 — one dup span
        # each, covering 4 tokens; doc 3 is unique.
        got = _stats(
            spark,
            [(1, "a b c d e f"), (2, "a b c d x y"), (3, "u v w x y z")],
            k=4,
        )
        assert got == [(1, 3, 1, 4), (2, 3, 1, 4), (3, 3, 0, 0)]

    def test_intra_doc_repetition_counts(self, spark):
        # "m"×8, k=4: all 5 grams are the same string → every position
        # duplicated; union coverage = the whole 8 tokens (ExactSubstr
        # counts self-repetition).
        got = _stats(spark, [(4, "m m m m m m m m")], k=4)
        assert got == [(4, 5, 5, 8)]

    def test_short_doc_zero_spans(self, spark):
        got = _stats(spark, [(5, "p q r"), (6, "p q r")], k=4)
        assert got == [(5, 0, 0, 0), (6, 0, 0, 0)]

    def test_coverage_union_disjoint_and_overlapping(self, spark):
        # doc 7 vs 8: shared grams at pos 0 ("a b c") and pos 4
        # ("x y z") are disjoint → coverage 6; doc 9 vs 10 share the
        # overlapping pair pos 0/1 ("c1 c2 c3", "c2 c3 c4") → union
        # [0,4) = 4 tokens, not 6.
        got = _stats(
            spark,
            [
                (7, "a b c q x y z"),
                (8, "a b c r x y z"),
                (9, "c1 c2 c3 c4 t1"),
                (10, "c1 c2 c3 c4 t2"),
            ],
            k=3,
        )
        assert got == [
            (7, 5, 2, 6),
            (8, 5, 2, 6),
            (9, 3, 2, 4),
            (10, 3, 2, 4),
        ]

    def test_min_count_three(self, spark):
        # the gram appears twice → below min_count=3, nothing flagged.
        rows = [(1, "a b c d"), (2, "a b c e")]
        assert _stats(spark, rows, k=3, min_count=3) == [
            (1, 2, 0, 0),
            (2, 2, 0, 0),
        ]
        assert _stats(spark, rows + [(3, "a b c f")], k=3, min_count=3) == [
            (1, 2, 1, 3),
            (2, 2, 1, 3),
            (3, 2, 1, 3),
        ]

    def test_positions_are_starts(self, spark):
        hits = dup_span_positions(
            _docs(spark, [(1, "a b c d e"), (2, "z b c d e")]), k=3
        )
        got = sorted((r.doc_id, r.pos) for r in hits.collect())
        # shared grams: "b c d" (pos 1) and "c d e" (pos 2) in both
        assert got == [(1, 1), (1, 2), (2, 1), (2, 2)]


class TestStripDupSpans:
    def _clean(self, spark, rows, k, **kw):
        out = strip_dup_spans(_docs(spark, rows), k=k, **kw).orderBy("doc_id")
        return [
            (r.doc_id, r.clean_text, r.n_kept, r.n_removed)
            for r in out.collect()
        ]

    def test_first_occurrence_kept_later_cut(self, spark):
        got = self._clean(
            spark,
            [(1, "a b c d e f"), (2, "a b c d x y"), (3, "p q r")],
            k=4,
        )
        assert got == [
            (1, "a b c d e f", 6, 0),
            (2, "x y", 2, 4),
            (3, "p q r", 3, 0),
        ]

    def test_self_overlap_union_semantics(self, spark):
        # "m"×8, k=4: removal intervals for occurrences at pos 1..4
        # union to [1,8) — only position 0 survives (the documented
        # substring-removal behavior on self-overlapping repeats).
        assert self._clean(spark, [(4, "m m m m m m m m")], k=4) == [
            (4, "m", 1, 7)
        ]

    def test_fully_covered_doc_keeps_empty_text(self, spark):
        # doc 2 is an exact copy of doc 1 at k = doc length: its one
        # gram is the later occurrence — everything removed.
        assert self._clean(
            spark, [(1, "x y z w"), (2, "x y z w")], k=4
        ) == [(1, "x y z w", 4, 0), (2, "", 0, 4)]

    def test_first_is_global_doc_pos_minimum(self, spark):
        # the shared gram appears at doc 5 pos 2 and doc 6 pos 0:
        # (5,2) < (6,0) by doc ordering, so doc 6 takes the cut.
        got = self._clean(
            spark, [(5, "q r a b c"), (6, "a b c t u")], k=3
        )
        assert got == [
            (5, "q r a b c", 5, 0),
            (6, "t u", 2, 3),
        ]

    def test_hash_path_matches_string_path(self, spark):
        rows = [(i, f"h{i % 3} j k l m{i}") for i in range(9)]
        s = self._clean(spark, rows, k=3, use_hash=False)
        h = self._clean(spark, rows, k=3, use_hash=True)
        assert s == h

    def test_null_text_zero_counts(self, spark):
        """r8 review: size(split(NULL)) is -1 in Spark — without the
        greatest() guard a NULL-text doc reported n_removed = -1 and
        diverged from the oracle. Both operators, both engines."""
        import duckdb

        from salesforce_postgresql_etl_spark.operators.dupspans import (
            dup_span_stats_sql,
            strip_dup_spans_sql,
        )

        rows = [(1, "a b c d"), (2, "a b c e"), (3, None)]
        df = _docs(spark, rows)
        assert self._clean(spark, rows, k=3)[2] == (3, "", 0, 0)
        assert _stats(spark, rows, k=3)[2] == (3, 0, 0, 0)
        con = duckdb.connect()
        con.register("docs_pd", df.toPandas())
        con.sql("CREATE VIEW documents AS SELECT * FROM docs_pd")
        strip = (
            con.sql(strip_dup_spans_sql(3))
            .df()
            .sort_values("doc_id")
            .values.tolist()
        )
        stats = (
            con.sql(dup_span_stats_sql(3))
            .df()
            .sort_values("doc_id")
            .values.tolist()
        )
        assert strip[2] == [3, "", 0, 0]
        assert stats[2] == [3, 0, 0, 0]


class TestHashPathEquality:
    def test_hash_equals_string_on_documents(self, spark):
        """The 128-bit two-hash shuffle key is exactly the string path
        on the real corpus — the wire-size optimization is lossless
        here (collision probability ~1e-13 at design scale)."""
        d = load(spark, SF_DIR, "documents")
        s = dup_span_stats(d, k=8, use_hash=False)
        h = dup_span_stats(d, k=8, use_hash=True)
        assert s.exceptAll(h).isEmpty() and h.exceptAll(s).isEmpty()
