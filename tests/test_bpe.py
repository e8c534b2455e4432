"""Iterative BPE trainer: greedy-merge fold goldens, hand-computed
toy-corpus merges, guards, and whole-vocabulary equivalence with the
DuckDB single-statement replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestMergeFold:
    def test_greedy_left_to_right_non_overlapping(self, spark):
        from ml_hadoop_experiment_spark.operators.bpe import merge_pair_expr

        df = spark.createDataFrame(
            [(["a", "a", "a"],), (["h", "e", "l", "l", "o"],)],
            "s array<string>",
        )
        got = [
            r["m"]
            for r in df.select(
                merge_pair_expr(F.col("s"), "a", "a").alias("m")
            ).collect()
        ]
        assert got[0] == ["aa", "a"]  # leftmost-first, no overlap
        assert got[1] == ["h", "e", "l", "l", "o"]
        got2 = df.select(
            merge_pair_expr(F.col("s"), "l", "l").alias("m")
        ).collect()
        assert got2[1]["m"] == ["h", "e", "ll", "o"]

    def test_merged_symbol_does_not_rematch(self, spark):
        """After merging (a, a) -> 'aa', the new last symbol 'aa' must
        not re-trigger against a following 'a' (the non-overlap rule)."""
        from ml_hadoop_experiment_spark.operators.bpe import merge_pair_expr

        df = spark.createDataFrame([(["a"] * 5,)], "s array<string>")
        got = df.select(
            merge_pair_expr(F.col("s"), "a", "a").alias("m")
        ).collect()[0]["m"]
        assert got == ["aa", "aa", "a"]


class TestBpeLearn:
    def test_toy_corpus_merges_and_segmentation(self, spark):
        from ml_hadoop_experiment_spark.operators.bpe import bpe_learn

        docs = spark.createDataFrame(
            [("low low low lower lowest",), ("new newer newest low",)],
            "text string",
        )
        out, merges = bpe_learn(docs, "text", n_merges=3)
        # merge 1: 'l o' and 'o w' tie at 6, pair asc -> ('l','o');
        # merge 2: ('lo','w') at 6; merge 3: 'e w' and 'n e' tie at 3
        # (the 'w e' pairs died inside 'low') -> ('e','w')
        assert [(m[0], m[1]) for m in merges] == [
            ("l", "o"), ("lo", "w"), ("e", "w"),
        ]
        seg = {r["word"]: r["segmentation"] for r in out.collect()}
        assert seg["low"] == "low"
        assert seg["lowest"] == "low e s t"
        assert seg["newer"] == "n ew e r"
        counts = {r["word"]: r["word_count"] for r in out.collect()}
        assert counts["low"] == 4

    def test_guards(self, spark):
        from ml_hadoop_experiment_spark.operators.bpe import bpe_learn

        docs = spark.createDataFrame([("ab ab",)], "text string")
        with pytest.raises(ValueError, match="positive"):
            bpe_learn(docs, "text", n_merges=0)
        with pytest.raises(ValueError, match="exhausted after 1"):
            # one merge ('a','b') empties every pair; merge 2 must fail
            # loudly, not silently diverge from the unrolled SQL
            bpe_learn(docs, "text", n_merges=2)

    def test_apply_segments_documents_in_order(self, spark):
        from ml_hadoop_experiment_spark.operators.bpe import (
            bpe_apply,
            bpe_learn,
        )

        docs = spark.createDataFrame(
            [(1, "low low low lower lowest"), (2, "new newer newest low"),
             (3, "a lone x")],
            "doc_id long, text string",
        )
        vocab, merges = bpe_learn(docs, "text", n_merges=3)
        out = {r["id"]: r for r in bpe_apply(
            docs, "doc_id", "text", vocab
        ).collect()}
        # merges on THIS corpus: (l,o), (lo,w), then (n,e) — "lone"
        # lifts 'n e' to 4 over 'e w' at 3. Doc order preserved; words
        # shorter than 2 chars pass through as their own token
        assert [(m[0], m[1]) for m in merges] == [
            ("l", "o"), ("lo", "w"), ("n", "e"),
        ]
        assert out[1]["tokens"] == "low low low low e r low e s t"
        assert out[1]["n_tokens"] == 10
        assert out[2]["tokens"] == "ne w ne w e r ne w e s t low"
        assert out[3]["tokens"] == "a lo ne x"
        assert out[3]["n_tokens"] == 4

    def test_apply_oov_words_segment_by_trained_merges(self, spark):
        """Cross-corpus application: a word UNSEEN at training time
        must be segmented by the trained merges applied to its chars
        (what the tokenizer produces on new text), not passed through
        as one unsegmented token."""
        from ml_hadoop_experiment_spark.operators.bpe import (
            bpe_apply,
            bpe_learn,
        )

        train = spark.createDataFrame(
            [("low low low lower lowest",), ("new newer newest low",),
             ("a lone x",)],
            "text string",
        )
        vocab, merges = bpe_learn(train, "text", n_merges=3)
        # merges: (l,o), (lo,w), (n,e). 'lowland' is OOV: chars ->
        # (l,o)->'lo' ... -> lo w l a n d -> (lo,w)->'low' -> low l a n d
        # -> (n,e): no 'n e' adjacency -> final: low l a n d
        new = spark.createDataFrame(
            [(9, "lowland low")], "doc_id long, text string"
        )
        with_m = bpe_apply(new, "doc_id", "text", vocab, merges=merges)
        assert with_m.collect()[0]["tokens"] == "low l a n d low"
        without = bpe_apply(new, "doc_id", "text", vocab)
        assert without.collect()[0]["tokens"] == "lowland low"

    def test_apply_matches_duckdb_train_and_apply(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.bpe import (
            bpe_apply,
            bpe_apply_sql,
            bpe_learn,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        vocab, merges = bpe_learn(docs, "text", n_merges=4)
        s = sorted(
            map(
                tuple,
                bpe_apply(
                    docs, "doc_id", "text", vocab, merges=merges
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet')"
        )
        d = sorted(map(tuple, con.execute(
            bpe_apply_sql("documents", "doc_id", "text", 4)
        ).fetchall()))
        con.close()
        assert s == d

    def test_matches_duckdb_full_loop(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.bpe import (
            bpe_learn,
            bpe_learn_sql,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out, merges = bpe_learn(docs, "text", n_merges=4)
        s = sorted(map(tuple, out.collect()))
        assert len(merges) == 4
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/documents.parquet')"
        )
        d = sorted(map(tuple, con.execute(
            bpe_learn_sql("documents", "text", 4)
        ).fetchall()))
        con.close()
        assert s == d


class TestBatchedMerges:
    CORPUS = [
        ("low low low lower lowest new newer newest",),
        ("wide wider widest low slow slower slowest",),
        ("deep deeper deepest steep steeper steepest",),
    ]

    def _counting_collect(self, spark, monkeypatch):
        # patch the CONCRETE class (pyspark 4.x: pyspark.sql.DataFrame
        # is abstract; classic.DataFrame overrides collect)
        cls = type(spark.range(1))
        calls = {"n": 0}
        orig = cls.collect

        def counting(df):
            calls["n"] += 1
            return orig(df)

        monkeypatch.setattr(cls, "collect", counting)
        return calls

    def test_batched_equals_sequential_and_cuts_rounds(
        self, spark, monkeypatch
    ):
        from ml_hadoop_experiment_spark.operators.bpe import bpe_learn

        docs = spark.createDataFrame(self.CORPUS, "text string")
        n = 8
        calls = self._counting_collect(spark, monkeypatch)
        seg1, merges1 = bpe_learn(docs, "text", n)
        out1 = sorted(tuple(r) for r in seg1.collect())
        seq_rounds = calls["n"] - 1  # minus the result collect
        calls["n"] = 0
        seg4, merges4 = bpe_learn(docs, "text", n, merges_per_round=4)
        out4 = sorted(tuple(r) for r in seg4.collect())
        batch_rounds = calls["n"] - 1
        # result-equality with m=1 on the fixture (merge LIST and the
        # full segmented vocabulary), with measurably fewer driver
        # rounds (the jobs-per-vocab reduction)
        assert merges4 == merges1
        assert out4 == out1
        assert seq_rounds == n
        assert batch_rounds < seq_rounds, (batch_rounds, seq_rounds)

    def test_wordpiece_batched_equals_sequential(
        self, spark, monkeypatch
    ):
        """Equality fixture where the commutation provably holds:
        2-char words over disjoint alphabets — merging one word
        creates NO new pairs (size-1 symbol arrays) and touches no
        other word's symbol counts, so batched selection == strict
        sequential. (On corpora with longer words WordPiece batching
        is documented-approximate: a merge's created pairs have small
        new-symbol denominators and jump the score queue.)"""
        from ml_hadoop_experiment_spark.operators.wordpiece import (
            wordpiece_learn,
        )

        docs = spark.createDataFrame(
            [("ab ab ab ab cd cd cd ef ef gh ij kl",)], "text string"
        )
        n = 6
        calls = self._counting_collect(spark, monkeypatch)
        seg1, merges1 = wordpiece_learn(docs, "text", n)
        out1 = sorted(tuple(r) for r in seg1.collect())
        seq_rounds = calls["n"] - 1
        calls["n"] = 0
        seg3, merges3 = wordpiece_learn(
            docs, "text", n, merges_per_round=3
        )
        out3 = sorted(tuple(r) for r in seg3.collect())
        batch_rounds = calls["n"] - 1
        assert merges3 == merges1
        assert out3 == out1
        assert seq_rounds == n
        assert batch_rounds < seq_rounds, (batch_rounds, seq_rounds)

    def test_disjoint_prefix_stops_at_conflict(self):
        from ml_hadoop_experiment_spark.operators.bpe import (
            _disjoint_prefix,
        )

        got = _disjoint_prefix(
            [("a b", 9), ("c d", 8), ("b e", 7), ("f g", 6)]
        )
        # "b e" shares 'b' with the first pick: the prefix STOPS there
        # (skipping would reorder the greedy sequence), so "f g" is
        # excluded even though it conflicts with nothing
        assert got == [("a", "b", 9), ("c", "d", 8)]

    def test_rejects_nonpositive_batch(self, spark):
        from ml_hadoop_experiment_spark.operators.bpe import bpe_learn

        docs = spark.createDataFrame(self.CORPUS, "text string")
        with pytest.raises(ValueError, match="merges_per_round"):
            bpe_learn(docs, "text", 2, merges_per_round=0)
