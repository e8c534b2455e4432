"""WordPiece trainer + longest-match encoder (operators/wordpiece.py).

Hand-computed merge decisions (likelihood gain vs raw frequency), the
greedy longest-match/[UNK] contract, and full-loop DuckDB twins on a
crafted corpus — the bpe/unigram test discipline.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.wordpiece import (
    UNK,
    greedy_seg_expr,
    merge_wp_pair_expr,
    wordpiece_encode,
    wordpiece_encode_sql,
    wordpiece_learn,
    wordpiece_learn_sql,
)

ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat can cat the catnap"),
    (3, "banana bandana ban"),
    (4, "Mat and CAT and the THE the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in ROWS)
        + ") AS t(doc_id, text)"
    )
    yield c
    c.close()


class TestLearn:
    def test_likelihood_gain_beats_raw_frequency(self, spark):
        """Corpus where the most FREQUENT pair is not the best-SCORING
        pair: ('a','##b') occurs 4x but both symbols are common
        (4*6=24 joint mass), while ('x','##y') occurs 3x out of 3x3 —
        score 3/9 > 4/24, so likelihood gain picks (x, ##y) first where
        raw-frequency BPE would pick (a, ##b)."""
        df = spark.createDataFrame(
            [(1, "ab ab ab ab ac bb xy xy xy")], "doc_id long, text string"
        )
        _, merges = wordpiece_learn(df, "text", n_merges=1)
        assert merges[0][:2] == ("x", "##y")

    def test_merge_keeps_left_prefix_status(self, spark):
        """Merging ('##a', '##b') yields '##ab'; merging ('t', '##h')
        yields 'th' — the continuation marker belongs to the word
        position, not the merge."""
        df = spark.createDataFrame([("xab",), ("thx",)], "w string")
        out = df.select(
            F.array_join(
                merge_wp_pair_expr(
                    F.expr(
                        "transform(sequence(1, length(w)), i -> CASE"
                        " WHEN i = 1 THEN substring(w, i, 1)"
                        " ELSE '##' || substring(w, i, 1) END)"
                    ),
                    "##a",
                    "##b",
                ),
                " ",
            ).alias("s")
        ).collect()
        assert out[0]["s"] == "x ##ab"
        assert out[1]["s"] == "t ##h ##x"

    def test_learn_matches_duckdb_twin(self, spark, docs, con):
        vocab, _ = wordpiece_learn(docs, "text", n_merges=4)
        sp = sorted(tuple(r) for r in vocab.collect())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                wordpiece_learn_sql("docs", "text", 4)
            ).fetchall()
        )
        assert sp == dk

    def test_rejects_nonpositive_merges(self, spark, docs):
        with pytest.raises(ValueError):
            wordpiece_learn(docs, "text", n_merges=0)
        with pytest.raises(ValueError):
            wordpiece_learn_sql("docs", "text", 0)


class TestEncode:
    def test_longest_match_first_and_unk(self, spark):
        """Pieces {'un', '##able', '##a', 'u', '##n', ...}: 'unable'
        must take 'un' + '##able' (longest at each step), not
        character pieces; a word with an uncovered position encodes to
        a single [UNK]."""
        df = spark.createDataFrame(
            [("unable",), ("unq",)], "w string"
        )
        m = F.map_from_entries(
            F.expr(
                "transform(array('un', '##able', '##a', 'u', '##n',"
                " '##b', '##l', '##e'), p -> struct(p, 1))"
            )
        )
        out = df.select(
            greedy_seg_expr(F.col("w"), m, max_piece_len=5).alias("seg")
        ).collect()
        assert out[0]["seg"] == "un ##able"
        assert out[1]["seg"] == UNK  # '##q' not in the vocabulary

    def test_cap_is_engine_consistent_not_trained(self, spark):
        """A piece longer than max_piece_len simply never matches: the
        cap is an operator contract, so the segmentation falls back to
        shorter covered pieces deterministically."""
        df = spark.createDataFrame([("abcdef",)], "w string")
        m = F.map_from_entries(
            F.expr(
                "transform(array('abcdef', 'abc', '##def', 'a', '##b',"
                " '##c', '##d', '##e', '##f'), p -> struct(p, 1))"
            )
        )
        out = df.select(
            greedy_seg_expr(F.col("w"), m, max_piece_len=3).alias("seg")
        ).collect()
        assert out[0]["seg"] == "abc ##def"  # 6-char piece is dead weight

    def test_encode_matches_duckdb_twin(self, spark, docs, con):
        vocab, _ = wordpiece_learn(docs, "text", n_merges=4)
        enc = wordpiece_encode(
            docs, "doc_id", "text", vocab, max_piece_len=8
        )
        sp = sorted(tuple(r) for r in enc.collect())
        dk = sorted(
            tuple(r)
            for r in con.execute(
                wordpiece_encode_sql("docs", "doc_id", "text", 4, 8)
            ).fetchall()
        )
        assert sp == dk

    def test_encode_plan_has_no_python_crossing(self, spark, docs):
        """Train + encode stays JVM-side: no BatchEvalPython /
        ArrowEvalPython / FlatMapsInPandas in the executed plan."""
        vocab, _ = wordpiece_learn(docs, "text", n_merges=2)
        enc = wordpiece_encode(docs, "doc_id", "text", vocab)
        plan = enc._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert marker not in plan
