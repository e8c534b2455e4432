"""Curation operators: benchmark decontamination + normalized dedup.

Covers semantics the oracle gate can't see: plan shape (broadcast on the
benchmark side, no corpus shuffle of payload columns), the conservative
hash-collision direction, and the anti-join filter form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.curation import (
    contamination_report,
    decontaminate,
    dedup_normalized,
    normalize_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestContamination:
    def test_exact_overlap_flagged(self, spark):
        corpus = _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated words with no overlap at all"),
                (3, "quick brown fox jumps over everything else entirely"),
            ],
        )
        bench = _docs(spark, [(100, "a quick brown fox jumps over a fence")])
        out = contamination_report(
            corpus, bench, "doc_id", "text", ngram_size=5
        ).toPandas().set_index("id")
        # docs 1 and 3 share the 5-gram "quick brown fox jumps over"
        assert set(out.index) == {1, 3}
        assert (out["n_hit_grams"] >= 1).all()

    def test_short_doc_whole_text_gram(self, spark):
        corpus = _docs(spark, [(1, "tiny doc"), (2, "other words")])
        bench = _docs(spark, [(100, "tiny doc")])
        out = contamination_report(
            corpus, bench, "doc_id", "text", ngram_size=5
        ).toPandas()
        assert out["id"].tolist() == [1]

    def test_decontaminate_removes_only_hits(self, spark):
        corpus = _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated words with no overlap at all"),
            ],
        )
        bench = _docs(spark, [(100, "the quick brown fox jumps far")])
        kept = decontaminate(corpus, bench, "doc_id", "text", ngram_size=5)
        assert kept.select("doc_id").toPandas()["doc_id"].tolist() == [2]

    def test_unhashed_grams_equal_hashed_on_clean_data(self, spark):
        corpus = _docs(
            spark,
            [(i, f"sentence number {i} with shared suffix tail words here") for i in range(6)],
        )
        bench = _docs(spark, [(100, "shared suffix tail words here and more")])
        a = contamination_report(
            corpus, bench, "doc_id", "text", ngram_size=5, hash_grams=True
        ).toPandas().sort_values("id", ignore_index=True)
        b = contamination_report(
            corpus, bench, "doc_id", "text", ngram_size=5, hash_grams=False
        ).toPandas().sort_values("id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)

    def test_benchmark_side_is_broadcast(self, spark):
        corpus = _docs(spark, [(1, "one two three four five six")])
        bench = _docs(spark, [(100, "one two three four five")])
        plan = contamination_report(
            corpus, bench, "doc_id", "text"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestDedupNormalized:
    def test_reformatted_copies_collapse(self, spark):
        df = _docs(
            spark,
            [
                (1, "Hello, World!"),
                (2, "hello   world"),
                (3, "HELLO WORLD."),
                (4, "goodbye world"),
            ],
        )
        out = dedup_normalized(df, "doc_id", "text").toPandas()
        assert sorted(out["doc_id"].tolist()) == [1, 4]

    def test_distinct_texts_survive(self, spark):
        df = _docs(spark, [(1, "alpha beta"), (2, "alpha gamma")])
        out = dedup_normalized(df, "doc_id", "text")
        assert out.count() == 2

    def test_normalize_text_expression(self, spark):
        df = _docs(spark, [(1, "  A-B  c!! 9 ")])
        v = df.select(normalize_text(F.col("text")).alias("n")).head()["n"]
        assert v == "a b c 9"


class TestRepeatedNgrams:
    def test_cross_doc_span_detected(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import repeated_ngrams

        shared = "the quick brown fox jumps over the lazy dog"
        docs = spark.createDataFrame(
            [
                (1, f"intro one {shared} outro alpha"),
                (2, f"completely different opening {shared} and ending"),
                (3, "no overlap with anything else at all here today"),
            ],
            "doc_id long, text string",
        )
        out = repeated_ngrams(
            docs, "doc_id", "text", ngram_size=5, min_docs=2, hash_grams=False
        ).collect()
        grams = {r["gram"]: r["n_docs"] for r in out}
        # every 5-gram inside the shared span appears in docs 1 and 2
        assert grams.get("the quick brown fox jumps") == 2
        assert all(n >= 2 for n in grams.values())
        # nothing from doc 3 leaks in
        assert not any("overlap" in g for g in grams)

    def test_within_doc_repeat_not_counted(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import repeated_ngrams

        # the same 3-gram repeated INSIDE one doc is not cross-doc duplication
        docs = spark.createDataFrame(
            [(1, "spam spam spam spam spam spam")], "doc_id long, text string"
        )
        out = repeated_ngrams(
            docs, "doc_id", "text", ngram_size=3, min_docs=2, hash_grams=False
        ).collect()
        assert out == []


class TestTokenBudget:
    def test_budget_cutoff_semantics(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            token_budget_select,
        )

        rows = [
            (1, "a b c d", 0.9),   # 4 tokens, best
            (2, "e f g", 0.8),     # 3 tokens
            (3, "h i", 0.7),       # 2 tokens - crosses the line
            (4, "j k l m n", 0.6), # excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, q double")
        out = {r["doc_id"]: r["cum_tokens"] for r in
               token_budget_select(df, "doc_id", "text", budget_tokens=8,
                                   priority_col="q").collect()}
        # docs 1,2 fit (7 tokens); doc 3 starts at 7 < 8 so it crosses in
        assert out == {1: 4, 2: 7, 3: 9}

    def test_no_priority_uses_id_order(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            token_budget_select,
        )

        rows = [(i, "t " * 10) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        kept = sorted(r["doc_id"] for r in
                      token_budget_select(df, "doc_id", "text", 55).collect())
        # 10 tokens each ("t "*10 strips to 10): ids 0-5 (exclusive prefix 50 < 55)
        assert kept == [0, 1, 2, 3, 4, 5]


class TestRepeatedSpans:
    def test_merges_overlapping_grams_into_maximal_span(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import repeated_spans

        shared = "one two three four five six"  # 6 tokens, 3 shared 4-grams
        rows = [
            (1, f"prefixA {shared} suffixA"),
            (2, f"prefixB unrelated {shared} trailing words here"),
            (3, "entirely different text with no overlap at all beyond"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["id"], r["span_start"], r["span_end"], r["span_tokens"])
               for r in repeated_spans(df, "doc_id", "text",
                                       ngram_size=4, min_docs=2).collect()}
        # doc 1: shared starts at token 1, ends token 6 -> one maximal span
        # doc 2: shared starts at token 2, ends token 7
        assert out == {(1, 1, 6, 6), (2, 2, 7, 6)}

    def test_disjoint_repeats_stay_separate_spans(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import repeated_spans

        a = "alpha beta gamma delta"
        b = "epsilon zeta eta theta"
        rows = [
            (1, f"{a} XX1 YY1 ZZ1 {b}"),
            (2, f"{a} QQ2 WW2 EE2 {b}"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = sorted((r["id"], r["span_start"], r["span_end"]) for r in
                     repeated_spans(df, "doc_id", "text",
                                    ngram_size=4, min_docs=2).collect())
        # two separate 4-token spans per doc (positions 0-3 and 7-10)
        assert out == [(1, 0, 3), (1, 7, 10), (2, 0, 3), (2, 7, 10)]

    def test_within_doc_repeat_not_counted(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import repeated_spans

        # the gram repeats only WITHIN one doc -> min_docs=2 not met
        df = spark.createDataFrame(
            [(1, "a b c d x y z a b c d"), (2, "totally other words here now")],
            "doc_id long, text string",
        )
        assert repeated_spans(df, "doc_id", "text",
                              ngram_size=4, min_docs=2).count() == 0


class TestSourceOverlap:
    def test_matrix_counts_distinct_shared_contents(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import source_overlap

        rows = [
            (1, "dup one", "cc"),
            (2, "dup one", "cc"),      # same content twice in cc: counts ONCE
            (3, "dup one", "books"),
            (4, "dup two", "cc"),
            (5, "dup two", "wiki"),
            (6, "dup two", "books"),
            (7, "only cc", "cc"),
            (8, None, "cc"),           # NULL content: digest is null-safe
            (9, None, "wiki"),
            (10, "null src", None),    # NULL group never pairs
            (11, "null src", "cc"),
        ]
        df = spark.createDataFrame(rows, "id bigint, text string, source string")
        got = {
            (r["group_a"], r["group_b"]): r["n_shared"]
            for r in source_overlap(df, ["text"], "source").collect()
        }
        assert got == {
            ("books", "cc"): 2,   # "dup one", "dup two"
            ("books", "wiki"): 1, # "dup two"
            ("cc", "wiki"): 2,    # "dup two", NULL content
        }

    def test_empty_when_sources_disjoint(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import source_overlap

        rows = [(1, "a", "x"), (2, "b", "y")]
        df = spark.createDataFrame(rows, "id bigint, text string, source string")
        assert source_overlap(df, ["text"], "source").count() == 0

    def test_fingerprint_mode_catches_tail_divergence(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import source_overlap

        rows = [
            (1, "The QUICK brown fox jumps over the lazy dog original tail", "a"),
            (2, "the quick brown fox jumps over the lazy dog EDITED ending", "b"),
            (3, "completely different text with no shared prefix at all", "b"),
            (4, "short", "a"),
            (5, "short", "c"),  # < k tokens: whole text is the fingerprint
        ]
        df = spark.createDataFrame(rows, "id bigint, text string, source string")
        # exact mode sees only the byte-identical "short" pair (a, c);
        # the prefix-divergent pair (a, b) is invisible to it
        exact = {
            (r["group_a"], r["group_b"]): r["n_shared"]
            for r in source_overlap(df, ["text"], "source").collect()
        }
        assert exact == {("a", "c"): 1}
        got = {
            (r["group_a"], r["group_b"]): r["n_shared"]
            for r in source_overlap(
                df, ["text"], "source", fingerprint_tokens=8
            ).collect()
        }
        assert got == {("a", "b"): 1, ("a", "c"): 1}

    def test_fingerprint_null_text_never_pairs(self, spark):
        """NULL text in fingerprint mode gets a NULL digest (not
        md5("") via concat_ws over the NULL token array), so NULL-text
        rows in different sources never count as shared content —
        matching the DuckDB twin, where md5(NULL) IS NULL drops out of
        the equi-join."""
        from ml_hadoop_experiment_spark.operators.curation import source_overlap

        rows = [
            (1, None, "a"),
            (2, None, "b"),
            (3, "shared prefix words here", "a"),
            (4, "shared prefix words here", "b"),
        ]
        df = spark.createDataFrame(rows, "id bigint, text string, source string")
        got = {
            (r["group_a"], r["group_b"]): r["n_shared"]
            for r in source_overlap(
                df, ["text"], "source", fingerprint_tokens=8
            ).collect()
        }
        assert got == {("a", "b"): 1}

    def test_fingerprint_requires_single_content_col(self, spark):
        import pytest as _pytest

        from ml_hadoop_experiment_spark.operators.curation import source_overlap

        df = spark.createDataFrame(
            [(1, "t", "u", "s")], "id bigint, a string, b string, src string"
        )
        with _pytest.raises(ValueError, match="exactly one content column"):
            source_overlap(df, ["a", "b"], "src", fingerprint_tokens=4)


class TestDecontaminateSpans:
    CORPUS = [
        (1, "a b c d e f"),
        (2, "x y z a b c"),
        (3, "q r"),
        (4, None),
        (5, "b c d e q r s t u v"),
        (6, ""),
    ]
    # the NULL-text benchmark row must be inert on BOTH engines
    # (Spark would otherwise emit the empty whole-text gram for it
    # and "contaminate" blank corpus docs; the twin filters NULL)
    BENCH = [(9, "b c d zz q r"), (10, "e q r"), (11, None)]

    def _frames(self, spark):
        return (
            spark.createDataFrame(self.CORPUS, "doc_id int, text string"),
            spark.createDataFrame(self.BENCH, "doc_id int, text string"),
        )

    def test_spans_merge_and_short_doc_rule(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            contaminated_spans,
        )

        cdf, bdf = self._frames(spark)
        spans = {
            (r["id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in contaminated_spans(
                cdf, bdf, "doc_id", "text", ngram_size=3
            ).collect()
        }
        # doc 1: gram 'b c d' at pos 1 -> [1, 3]; doc 5: 'b c d'@0 and
        # 'e q r'@3 overlap-adjacent -> merged [0, 5]
        assert spans == {(1, 1, 3, 3), (5, 0, 5, 6)}

    def test_cleaned_corpus_both_engines(self, spark):
        import duckdb
        import pandas as pd

        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_spans,
            decontaminate_spans_sql,
        )

        cdf, bdf = self._frames(spark)
        sp = (
            decontaminate_spans(cdf, bdf, "doc_id", "text", ngram_size=3)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = {
            r.doc_id: (r.clean_text, r.n_removed_tokens)
            for r in sp.itertuples()
        }
        assert got[1] == ("a e f", 3)
        assert got[2] == ("x y z a b c", 0)
        assert got[3] == ("q r", 0)
        assert got[4][0] is None and got[4][1] == 0
        assert got[5] == ("s t u v", 6)
        assert got[6] == ("", 0)
        con = duckdb.connect()
        con.register(
            "corpus", pd.DataFrame(self.CORPUS, columns=["doc_id", "text"])
        )
        con.register(
            "bench", pd.DataFrame(self.BENCH, columns=["doc_id", "text"])
        )
        du = (
            con.execute(
                decontaminate_spans_sql(
                    "corpus", "bench", "doc_id", "text",
                    ngram_size=3, out_id="doc_id",
                )
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ["doc_id", "clean_text", "n_removed_tokens"]:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c

    def test_fully_contaminated_doc_keeps_empty_string(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_spans,
        )

        cdf = spark.createDataFrame(
            [(1, "p q r"), (2, "clean words only here")],
            "doc_id int, text string",
        )
        bdf = spark.createDataFrame([(9, "p q r")], "doc_id int, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
            for r in decontaminate_spans(
                cdf, bdf, "doc_id", "text", ngram_size=3
            ).collect()
        }
        assert got[1] == ("", 3)
        assert got[2] == ("clean words only here", 0)

    def test_corpus_never_shuffles_payload(self, spark):
        """The cleaned-corpus plan must broadcast the span frame, not
        exchange the corpus: no hash exchange may carry the text
        column."""
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_spans,
        )
        from ml_hadoop_experiment_spark.plans.optimize import (
            executed_plan_str,
        )

        cdf, bdf = self._frames(spark)
        out = decontaminate_spans(cdf, bdf, "doc_id", "text", ngram_size=3)
        plan = executed_plan_str(out)
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


class TestDecontaminateExact:
    """Round-12: any-length exact-substring decontamination (Lee et al.
    2022 contract) — the behavioral differences vs the fixed-gram
    family, cross-engine span-extension agreement, and the broadcast
    plan shape."""

    BENCH = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _frames(self, spark):
        corpus = _docs(spark, [
            (1, "xx yy " + self.BENCH + " zz ww"),      # full 10-token run
            (2, "alpha beta gamma delta XX XX eta theta iota kappa"),
            (3, "pre alpha beta gamma delta epsilon zeta eta theta post"),
            (4, "totally unrelated text with many words here indeed"),
            (5, "alpha beta"),                            # too short
            (6, None),
            (7, self.BENCH),                              # fully cut
        ])
        bench = _docs(spark, [(100, self.BENCH), (101, None)])
        return corpus, bench

    def test_patchwork_is_not_cut_but_contiguous_runs_are(self, spark):
        """Doc 2 holds two disjoint 4-gram matches (each extends to only
        4 tokens < min_len 8): the fixed-gram form would cut both; the
        exact form must keep the document intact. Docs 1/3/7 hold true
        contiguous runs >= 8 and are cut to their FULL extents."""
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
        )

        corpus, bench = self._frames(spark)
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
            for r in decontaminate_exact(
                corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
            ).collect()
        }
        assert got[1] == ("xx yy zz ww", 10)
        assert got[2] == (
            "alpha beta gamma delta XX XX eta theta iota kappa", 0
        )
        assert got[3] == ("pre post", 8)
        assert got[4][1] == 0
        assert got[5] == ("alpha beta", 0)
        assert got[6] == (None, 0)
        assert got[7] == ("", 10)

    def test_extension_crosses_seed_boundaries_exactly(self, spark):
        """A 9-token shared run seeded by 4-grams must cut exactly 9
        tokens — the bidirectional extension reaches the full extent,
        not a whole-gram multiple."""
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
        )

        nine = " ".join(self.BENCH.split()[:9])
        corpus = _docs(spark, [(1, "a b " + nine + " c")])
        bench = _docs(spark, [(100, self.BENCH)])
        got = decontaminate_exact(
            corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
        ).collect()[0]
        assert got["clean_text"] == "a b c"
        assert got["n_removed_tokens"] == 9

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
            decontaminate_exact_sql,
        )

        corpus, bench = self._frames(spark)
        sp = sorted(
            tuple(r)
            for r in decontaminate_exact(
                corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
            ).collect()
        )
        con = duckdb.connect()
        con.register("corpus_v", corpus.toPandas())
        con.register("bench_v", bench.toPandas())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                decontaminate_exact_sql(
                    "corpus_v", "bench_v", "doc_id", "text",
                    min_len=8, seed_gram=4, out_id="doc_id",
                )
            ).fetchall()
        )
        con.close()
        assert sp == dk

    def test_rejects_bad_parameters(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
            decontaminate_exact_sql,
        )

        corpus, bench = self._frames(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            decontaminate_exact(
                corpus, bench, "doc_id", "text", min_len=3, seed_gram=4
            )
        with _pytest.raises(ValueError):
            decontaminate_exact_sql(
                "c", "b", "doc_id", "text", min_len=3, seed_gram=4
            )

    def test_corpus_never_shuffles_payload(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
        )
        from ml_hadoop_experiment_spark.plans.optimize import (
            executed_plan_str,
        )

        corpus, bench = self._frames(spark)
        out = decontaminate_exact(
            corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
        )
        plan = executed_plan_str(out)
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


class TestDedupExactSubstrings:
    """Round-12: cross-document exact-substring SELF-dedup (keep-first)."""

    RUN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _corpus(self, spark):
        return _docs(spark, [
            (1, "xx " + self.RUN + " yy"),
            (2, "pre " + self.RUN + " post"),
            (3, "a b " + " ".join(self.RUN.split()[:9]) + " c"),
            (4, "clean totally different words here and more of them"),
            (5, None),
            (6, self.RUN),
        ])

    def test_keep_first_cuts_later_copies_only(self, spark):
        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
        )

        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
            for r in dedup_exact_substrings(
                self._corpus(spark), "doc_id", "text",
                min_len=8, seed_gram=4,
            ).collect()
        }
        assert got[1][1] == 0  # earliest owner untouched
        assert got[2] == ("pre post", 10)
        assert got[3] == ("a b c", 9)
        assert got[4][1] == 0
        assert got[5] == (None, 0)
        assert got[6] == ("", 10)

    def test_all_hot_grams_still_anchor_via_winnow_tier(self, spark):
        """Round-13 recall fix: with max_posting_width=2 the shared
        run's grams (3 postings each across docs 1/2/6) are ALL hot —
        the round-12 code found nothing; the winnow tier must now
        anchor the duplicate anyway, and both engines must agree on
        the winnowed result."""
        import duckdb

        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
            dedup_exact_substrings_sql,
        )

        corpus = self._corpus(spark)
        out = dedup_exact_substrings(
            corpus, "doc_id", "text",
            min_len=8, seed_gram=4, max_posting_width=2,
        )
        sp = sorted(tuple(r) for r in out.collect())
        # every seed gram is hot, yet later copies of the shared run
        # are cut (keep-first: the earliest doc keeps its copy)
        assert any(r[2] > 0 for r in sp)
        con = duckdb.connect()
        con.register("corpus_v", corpus.toPandas())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                dedup_exact_substrings_sql(
                    "corpus_v", "doc_id", "text",
                    min_len=8, seed_gram=4, max_posting_width=2,
                    out_id="doc_id",
                )
            ).fetchall()
        )
        con.close()
        assert sp == dk

    def test_hot_posting_width_is_the_final_cap_and_replayed(self, spark):
        """hot_posting_width bounds the winnow tier itself: squeezing
        it to max_posting_width (=2) drops the 3-doc shared gram from
        the winnow postings too, so nothing anchors — deterministic
        and oracle-replayed, the documented corpus-constant-text
        exclusion."""
        import duckdb

        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
            dedup_exact_substrings_sql,
        )

        corpus = self._corpus(spark)
        out = dedup_exact_substrings(
            corpus, "doc_id", "text",
            min_len=8, seed_gram=4, max_posting_width=2,
            hot_posting_width=2,
        )
        sp = sorted(tuple(r) for r in out.collect())
        assert all(r[2] == 0 for r in sp)
        con = duckdb.connect()
        con.register("corpus_v", corpus.toPandas())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                dedup_exact_substrings_sql(
                    "corpus_v", "doc_id", "text",
                    min_len=8, seed_gram=4, max_posting_width=2,
                    hot_posting_width=2,
                    out_id="doc_id",
                )
            ).fetchall()
        )
        con.close()
        assert sp == dk

    def test_planted_duplicate_with_every_gram_hot_is_found(self, spark):
        """The verdict's done-gate: plant a 12-token sentence in 70+
        documents so EVERY one of its 4-grams exceeds the default
        max_posting_width=64 — the pair (in fact the whole cluster)
        must still be found and cut from all but the first document."""
        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
        )

        sent = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (i, f"unique lead {i} alpha beta {sent} tail {i} omega")
            for i in range(70)
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
            for r in dedup_exact_substrings(
                corpus, "doc_id", "text", min_len=8, seed_gram=4
            ).collect()
        }
        # doc 0 keeps its copy; every later doc loses the full MAXIMAL
        # shared extent — "alpha beta <sent> tail" (the framing tokens
        # are shared too; extension finds the true extent, 15 tokens)
        assert out[0][1] == 0 and sent in out[0][0]
        for i in range(1, 70):
            assert out[i] == (f"unique lead {i} {i} omega", 15), (
                i, out[i],
            )

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
            dedup_exact_substrings_sql,
        )

        corpus = self._corpus(spark)
        sp = sorted(
            tuple(r)
            for r in dedup_exact_substrings(
                corpus, "doc_id", "text", min_len=8, seed_gram=4
            ).collect()
        )
        con = duckdb.connect()
        con.register("corpus_v", corpus.toPandas())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                dedup_exact_substrings_sql(
                    "corpus_v", "doc_id", "text",
                    min_len=8, seed_gram=4, out_id="doc_id",
                )
            ).fetchall()
        )
        con.close()
        assert sp == dk

    def test_rejects_bad_parameters(self, spark):
        import pytest as _pytest

        from ml_hadoop_experiment_spark.operators.curation import (
            dedup_exact_substrings,
            dedup_exact_substrings_sql,
        )

        with _pytest.raises(ValueError):
            dedup_exact_substrings(
                self._corpus(spark), "doc_id", "text",
                min_len=8, seed_gram=4, max_posting_width=1,
            )
        with _pytest.raises(ValueError):
            dedup_exact_substrings_sql(
                "c", "doc_id", "text", min_len=2, seed_gram=4
            )


class TestMergeExtentsRunningMax:
    """Round-12 review regression: a short extent NESTED inside a longer
    one must not split the maximal span (lag(span_end) saw the nested
    extent's early end and restarted the group; running max does not)."""

    def test_nested_extent_does_not_split_span(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.curation import (
            decontaminate_exact,
            decontaminate_exact_sql,
        )

        # benchmark doc A holds tokens 0..30 of the corpus doc; bench
        # doc B holds only tokens 2..10 (nested shorter extent); bench
        # doc C holds tokens 12..30. Anchors produce extents (0,30),
        # (2,10), (12,30) — one maximal span (0,30), cut whole.
        words = [f"w{i}" for i in range(40)]
        corpus = _docs(spark, [(1, " ".join(words))])
        bench = _docs(spark, [
            (100, " ".join(words[0:31])),
            (101, " ".join(words[2:11])),
            (102, " ".join(words[12:31])),
        ])
        out = decontaminate_exact(
            corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
        ).collect()[0]
        assert out["n_removed_tokens"] == 31
        assert out["clean_text"] == " ".join(words[31:])
        # span frame itself: exactly ONE maximal span, no overlaps
        from ml_hadoop_experiment_spark.operators.curation import (
            exact_substring_spans,
        )

        spans = exact_substring_spans(
            corpus, bench, "doc_id", "text", min_len=8, seed_gram=4
        ).collect()
        assert [(r["span_start"], r["span_end"]) for r in spans] == [(0, 30)]
        # SQL twin agrees
        con = duckdb.connect()
        con.register("c_v", corpus.toPandas())
        con.register("b_v", bench.toPandas())
        dk = con.execute(
            decontaminate_exact_sql(
                "c_v", "b_v", "doc_id", "text",
                min_len=8, seed_gram=4, out_id="doc_id",
            )
        ).fetchall()
        con.close()
        assert [tuple(r) for r in dk] == [
            (1, " ".join(words[31:]), 31)
        ]
