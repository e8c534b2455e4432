"""language_id: hand-computable goldens, tie-break determinism, and
the unknown/short-text boundary."""

from __future__ import annotations

from pyspark.sql import functions as F


def _profiles(spark, rows, k):
    from ml_hadoop_experiment_spark.operators.langid import (
        train_language_profiles,
    )

    df = spark.createDataFrame(rows, "lang string, text string")
    return train_language_profiles(df, "lang", "text", profile_size=k)


class TestTrainLanguageProfiles:
    def test_weights_are_rank_complements(self, spark):
        """'aaab': trigrams aaa, aab -> aaa and aab tie at 1 each;
        tie-break tri asc puts aaa at rank 1 (weight k), aab at rank 2
        (weight k-1)."""
        prof = _profiles(spark, [("xx", "aaab")], k=5)
        got = {r["tri"]: r["weight"] for r in prof.collect()}
        assert got == {"aaa": 5, "aab": 4}

    def test_profile_size_truncates(self, spark):
        """'abcde' has 3 distinct trigrams; k=2 keeps the 2 smallest
        (all tie at count 1)."""
        prof = _profiles(spark, [("xx", "abcde")], k=2)
        got = {r["tri"]: r["weight"] for r in prof.collect()}
        assert got == {"abc": 2, "bcd": 1}

    def test_lowercased_and_multiplicity(self, spark):
        """'AAAA' -> trigrams aaa, aaa: counted with multiplicity and
        lowercased before counting."""
        prof = _profiles(spark, [("xx", "AAAA"), ("xx", "zzz")], k=1)
        got = {r["tri"]: r["weight"] for r in prof.collect()}
        assert got == {"aaa": 1}  # count 2 beats zzz's count 1


class TestLanguageId:
    def test_hand_computed_prediction(self, spark):
        from ml_hadoop_experiment_spark.operators.langid import language_id

        prof = _profiles(
            spark, [("aa", "xxxxxx"), ("bb", "yyyyyy")], k=3
        )
        docs = spark.createDataFrame(
            [(1, "xxxx yy"), (2, "yyyy"), (3, "zzzz")],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["lang_pred"], r["score"])
            for r in language_id(docs, "doc_id", "text", prof).collect()
        }
        # doc 1: two 'xxx' occurrences * weight 3 = 6 for aa; no 'yyy'
        # trigram ('y' run too short) -> aa wins with 6
        # doc 2: two 'yyy' * 3 = 6 -> bb
        # doc 3: no profile hits -> und / 0
        assert got == {1: ("aa", 6), 2: ("bb", 6), 3: ("und", 0)}

    def test_tie_breaks_to_smallest_lang(self, spark):
        from ml_hadoop_experiment_spark.operators.langid import language_id

        prof = _profiles(
            spark, [("bb", "xxxxx"), ("aa", "xxxxx")], k=2
        )
        docs = spark.createDataFrame(
            [(7, "xxx")], "doc_id bigint, text string"
        )
        row = language_id(docs, "doc_id", "text", prof).collect()[0]
        assert (row["lang_pred"], row["score"]) == ("aa", 2)

    def test_null_and_short_text_rows_kept_as_unknown(self, spark):
        from ml_hadoop_experiment_spark.operators.langid import language_id

        prof = _profiles(spark, [("aa", "xxxx")], k=2)
        docs = spark.createDataFrame(
            [(1, None), (2, "ab"), (3, "xxx")],
            "doc_id bigint, text string",
        )
        out = language_id(docs, "doc_id", "text", prof, unknown="??")
        got = {
            r["doc_id"]: (r["lang_pred"], r["score"]) for r in out.collect()
        }
        assert got == {1: ("??", 0), 2: ("??", 0), 3: ("aa", 2)}
        assert dict(out.dtypes)["score"] == "bigint"

    def test_every_input_row_survives(self, spark, documents):
        from ml_hadoop_experiment_spark.operators.langid import (
            language_id,
            train_language_profiles,
        )

        prof = train_language_profiles(documents, "lang", "text", 50)
        out = language_id(documents, "doc_id", "text", prof)
        assert out.count() == documents.count()
        assert out.select("doc_id").distinct().count() == documents.count()


class TestSqlTwin:
    def test_unknown_label_quote_escaped(self):
        """An unknown label containing a single quote must produce a
        parseable (escaped) SQL literal, not a syntax error."""
        import duckdb

        from ml_hadoop_experiment_spark.operators.langid import (
            language_id_sql,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES"
            " (1, 'aa', 'xy')) AS v(doc_id, lang, text)"
        )
        sql = language_id_sql(
            "t", "t", "doc_id", "lang", "text", profile_size=5,
            unknown="it's",
        )
        rows = con.execute(sql).fetchall()  # 'xy' too short -> unknown
        assert rows == [(1, "aa", "it's", 0)]


class TestCharTrigrams:
    def test_boundary_lengths(self, spark):
        from ml_hadoop_experiment_spark.operators.langid import char_trigrams

        df = spark.createDataFrame(
            [("ab",), ("abc",), ("abcd",), (None,)], "t string"
        )
        got = [
            r["g"]
            for r in df.select(
                char_trigrams(F.col("t")).alias("g")
            ).collect()
        ]
        assert got == [[], ["abc"], ["abc", "bcd"], []]
