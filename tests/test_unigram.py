"""Unigram-LM tokenizer: Viterbi DP correctness (hand-computed
segmentation, total-order tie-breaks, OOV fallback), full-loop DuckDB
twins for learn and encode, feasibility invariants (every single
character retained), and plan shape (no Python crossing)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick dog barks at the lazy fox"),
    (3, "brown foxes and lazy dogs"),
    (4, "lowering lowercase lowlands slower flower"),
    (5, "the theme therefore thereafter"),
]
KW = dict(n_iters=2, seed_multi=30, vocab_size=20, max_piece_len=3)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    return c


class TestViterbi:
    def test_hand_computed_segmentation(self, spark):
        """Model: p(ab)=0.4, p(a)=0.2, p(b)=0.1. 'abab' best is
        [ab, ab] (0.16) over [a, b, ab] (0.008) etc.; 'aab' best is
        [a, ab] (0.08) over [a, a, b] (0.002)."""
        from ml_hadoop_experiment_spark.operators.unigram import (
            viterbi_seg_expr,
        )

        df = spark.createDataFrame([("abab",), ("aab",)], "w string")
        m = F.create_map(
            F.lit("ab"), F.lit(0.4),
            F.lit("a"), F.lit(0.2),
            F.lit("b"), F.lit(0.1),
        )
        out = df.select(
            viterbi_seg_expr(F.col("w"), m, 2).alias("seg")
        ).collect()
        assert [r["seg"] for r in out] == ["ab ab", "a ab"]

    def test_tie_breaks_fewer_pieces_then_lexicographic(self, spark):
        """p(aa)=0.25 vs p(a)=0.5: 'aa' products tie at 0.25 — fewer
        pieces wins -> 'aa'. Equal-probability single pieces: the DP
        explores longer pieces deterministically, not by map order."""
        from ml_hadoop_experiment_spark.operators.unigram import (
            viterbi_seg_expr,
        )

        df = spark.createDataFrame([("aa",)], "w string")
        m = F.create_map(
            F.lit("aa"), F.lit(0.25), F.lit("a"), F.lit(0.5)
        )
        out = df.select(
            viterbi_seg_expr(F.col("w"), m, 2).alias("seg")
        ).collect()
        assert out[0]["seg"] == "aa"

    def test_oov_fallback_prices_unknown_chars(self, spark):
        from ml_hadoop_experiment_spark.operators.unigram import (
            viterbi_seg_expr,
        )

        df = spark.createDataFrame([("axb",)], "w string")
        m = F.create_map(F.lit("a"), F.lit(0.5), F.lit("b"), F.lit(0.4))
        # without fallback: 'x' infeasible -> NULL
        no_fb = df.select(
            viterbi_seg_expr(F.col("w"), m, 2).alias("seg")
        ).collect()
        assert no_fb[0]["seg"] is None
        with_fb = df.select(
            viterbi_seg_expr(
                F.col("w"), m, 2, oov_fallback=True
            ).alias("seg")
        ).collect()
        assert with_fb[0]["seg"] == "a x b"

    def test_infeasible_prefix_cannot_beat_valid_segmentation(self, spark):
        """Round-12 ADVICE regression: model has 'ab' and 'b' but NOT
        'a', oov_fallback=False. Position 1 is unreachable (NULL DP
        state); at position 2 the j=1 candidate ('b' after the
        infeasible prefix) carries NULL np fields — structs sort
        nulls-FIRST under array_min, so without the prev-state guard it
        beat the legal ['ab'] and returned a NULL seg for a word that
        has a valid segmentation."""
        from ml_hadoop_experiment_spark.operators.unigram import (
            viterbi_seg_expr,
        )

        df = spark.createDataFrame([("ab",), ("abb",)], "w string")
        m = F.create_map(
            F.lit("ab"), F.lit(0.5), F.lit("b"), F.lit(0.4)
        )
        out = df.select(
            viterbi_seg_expr(F.col("w"), m, 2).alias("seg")
        ).collect()
        assert [r["seg"] for r in out] == ["ab", "ab b"]


class TestLearn:
    def test_learn_matches_duckdb_twin(self, spark, docs, con):
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_learn,
            unigram_learn_sql,
        )

        sp = (
            unigram_learn(docs, "text", **KW)
            .toPandas()
            .sort_values("piece")
            .reset_index(drop=True)
        )
        du = (
            con.execute(unigram_learn_sql("docs", "text", **KW))
            .df()
            .sort_values("piece")
            .reset_index(drop=True)
        )
        assert sp.equals(du)

    def test_every_corpus_char_retained_and_counts_positive_total(
        self, spark, docs
    ):
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_learn,
        )

        model = unigram_learn(docs, "text", **KW).collect()
        pieces = {r["piece"] for r in model}
        corpus_chars = {
            c
            for _, text in ROWS
            for w in text.lower().split()
            if len(w) >= 2
            for c in w
        }
        assert corpus_chars <= pieces
        # multi-char pieces capped at vocab_size
        assert sum(len(p) > 1 for p in pieces) <= KW["vocab_size"]
        # the E-step counts cover every word occurrence's characters
        assert sum(r["piece_count"] for r in model) > 0

    def test_n_iters_guard(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_learn,
        )

        with pytest.raises(ValueError, match="n_iters"):
            unigram_learn(docs, "text", n_iters=0)


class TestEncode:
    def test_encode_matches_duckdb_twin(self, spark, docs, con):
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_encode,
            unigram_encode_sql,
            unigram_learn,
        )

        model = unigram_learn(docs, "text", **KW)
        sp = (
            unigram_encode(
                docs, "doc_id", "text", model,
                max_piece_len=KW["max_piece_len"],
            )
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        du = (
            con.execute(
                unigram_encode_sql("docs", "doc_id", "text", **KW)
            )
            .df()
            .sort_values("id")
            .reset_index(drop=True)
        )
        for c in ["id", "n_tokens", "tokens"]:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c

    def test_roundtrip_concatenation_preserves_words(self, spark, docs):
        """Removing the separators from every document's token stream
        must reproduce the document's (lower/trimmed) words — the
        segmenter may only SPLIT, never alter characters."""
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_encode,
            unigram_learn,
        )

        model = unigram_learn(docs, "text", **KW)
        out = {
            r["id"]: r["tokens"]
            for r in unigram_encode(
                docs, "doc_id", "text", model,
                max_piece_len=KW["max_piece_len"],
            ).collect()
        }
        for doc_id, text in ROWS:
            assert out[doc_id].replace(" ", "") == text.lower().replace(
                " ", ""
            )

    def test_encode_plan_has_no_python_crossing(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.unigram import (
            unigram_encode,
            unigram_learn,
        )
        from ml_hadoop_experiment_spark.plans.optimize import (
            executed_plan_str,
        )

        model = unigram_learn(docs, "text", **KW)
        plan = executed_plan_str(
            unigram_encode(
                docs, "doc_id", "text", model,
                max_piece_len=KW["max_piece_len"],
            )
        )
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert marker not in plan
