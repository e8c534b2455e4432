"""ngram_novelty: hand-computable goldens, tokenization parity with the
dedup pipelines, and the score's boundary behavior."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestNgramNovelty:
    def test_hand_computed_fractions(self, spark):
        from ml_hadoop_experiment_spark.operators.novelty import ngram_novelty

        ref = spark.createDataFrame(
            [(100, "a b c d e")],  # shingles: "a b c","b c d","c d e"
            "doc_id bigint, text string",
        )
        tgt = spark.createDataFrame(
            [
                (1, "a b c d e"),    # all 3 shingles held -> 0.0
                (2, "a b c x y"),    # "a b c" held, "b c x","c x y" new -> 2/3
                (3, "p q r s"),      # both shingles new -> 1.0
            ],
            "doc_id bigint, text string",
        )
        got = {
            r["id"]: (r["n_shingles"], r["novelty"])
            for r in ngram_novelty(tgt, ref, "doc_id", "text", 3).collect()
        }
        assert got == {1: (3, 0.0), 2: (3, 0.666667), 3: (2, 1.0)}

    def test_short_doc_whole_text_rule_matches_dedup_tokenization(self, spark):
        """Docs shorter than the shingle emit their whole text as one
        token (tokens_frame's round-4 rule) — a short target held
        verbatim in the reference scores 0.0, not 'no shingles'."""
        from ml_hadoop_experiment_spark.operators.novelty import ngram_novelty

        ref = spark.createDataFrame([(9, "hi there")], "doc_id bigint, text string")
        tgt = spark.createDataFrame(
            [(1, "hi there"), (2, "bye now")], "doc_id bigint, text string"
        )
        got = {
            r["id"]: (r["n_shingles"], r["novelty"])
            for r in ngram_novelty(tgt, ref, "doc_id", "text", 3).collect()
        }
        assert got == {1: (1, 0.0), 2: (1, 1.0)}

    def test_duplicate_shingles_counted_once(self, spark):
        """The score is over DISTINCT shingles: repeating a novel
        shingle must not inflate novelty."""
        from ml_hadoop_experiment_spark.operators.novelty import ngram_novelty

        ref = spark.createDataFrame([(9, "a b c d")], "doc_id bigint, text string")
        tgt = spark.createDataFrame(
            [(1, "x y z x y z x y z a b c")], "doc_id bigint, text string"
        )
        row = ngram_novelty(tgt, ref, "doc_id", "text", 3).collect()[0]
        # distinct shingles: x y z / y z x / z x y / z a b / y z a / a b c
        assert row["n_shingles"] == 6
        assert row["novelty"] == 0.833333  # only "a b c" is held

    def test_empty_reference_scores_everything_novel(self, spark):
        from ml_hadoop_experiment_spark.operators.novelty import ngram_novelty

        ref = spark.createDataFrame([], "doc_id bigint, text string")
        tgt = spark.createDataFrame(
            [(1, "a b c d")], "doc_id bigint, text string"
        )
        row = ngram_novelty(tgt, ref, "doc_id", "text", 3).collect()[0]
        assert (row["n_shingles"], row["novelty"]) == (2, 1.0)

    def test_id_collision_across_inputs_is_safe(self, spark):
        """Same doc_id on both sides must not couple the rows — sides
        join by shingle only."""
        from ml_hadoop_experiment_spark.operators.novelty import ngram_novelty

        ref = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
        tgt = spark.createDataFrame([(1, "p q r s")], "doc_id bigint, text string")
        row = ngram_novelty(tgt, ref, "doc_id", "text", 3).collect()[0]
        assert (row["id"], row["novelty"]) == (1, 1.0)
