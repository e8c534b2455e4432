"""BPE-style pretokenization: hand-computed token splits, NULL/empty
boundaries, and the Java-vs-RE2 single-pattern contract via the
DuckDB twin."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestPretokens:
    def test_hand_computed_splits(self, spark):
        from ml_hadoop_experiment_spark.functions.pretoken import pretokens

        rows = [
            ("it's 2024, isn't it?",),
            ("hello world",),
            ("a1b2",),
            ("",),
            (None,),
        ]
        df = spark.createDataFrame(rows, "t string")
        got = [
            r["p"]
            for r in df.select(pretokens(F.col("t")).alias("p")).collect()
        ]
        # contractions split off; digits and symbol runs separate
        assert got[0] == ["it", "'s", "2024", ",", "isn", "'t", "it", "?"]
        assert got[1] == ["hello", "world"]
        assert got[2] == ["a", "1", "b", "2"]
        assert got[3] == []
        assert got[4] is None

    def test_count_coalesces_null_and_matches_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.functions.pretoken import (
            pretoken_count,
            pretoken_count_sql,
        )

        rows = [
            (1, "it's 2024, isn't it?"),
            (2, "hello   world"),
            (3, "can't-stop won't_stop 99 bottles!!"),
            (4, ""),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "id int, t string")
        sp = {
            r["id"]: r["n"]
            for r in df.select(
                "id", pretoken_count(F.col("t")).alias("n")
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES"
            " (1, 'it''s 2024, isn''t it?'),"
            " (2, 'hello   world'),"
            " (3, 'can''t-stop won''t_stop 99 bottles!!'),"
            " (4, ''), (5, NULL)) AS v(id, t)"
        )
        du = dict(
            con.execute(
                f"SELECT id, {pretoken_count_sql('t')} FROM t"
            ).fetchall()
        )
        assert sp == du
        assert sp[1] == 8 and sp[4] == 0 and sp[5] == 0

    def test_fertility_exceeds_one_on_punctuated_text(self, spark):
        """The point of the pretoken count: punctuated text costs more
        subword units than whitespace words."""
        from ml_hadoop_experiment_spark.functions.pretoken import (
            pretoken_count,
        )
        from ml_hadoop_experiment_spark.functions.text import token_count

        df = spark.createDataFrame(
            [("it's a test, isn't it?",)], "t string"
        )
        row = df.select(
            token_count(F.col("t")).alias("w"),
            pretoken_count(F.col("t")).alias("p"),
        ).collect()[0]
        assert row["p"] > row["w"]
