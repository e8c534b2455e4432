"""Text-analysis expression tests (+ DuckDB twin parity on real docs)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.functions import text as X


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, "the cat is in the house and it is warm"),
        (2, "le chat est dans la maison et les oiseaux"),
        (3, "der hund ist in dem haus und die katze"),
        (4, "xyzzy plugh"),
    ]
    return spark.createDataFrame(rows, "id bigint, text string")


def test_token_count(sample):
    got = {r["id"]: r["n"] for r in
           sample.select("id", X.token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 10
    assert got[4] == 2


def test_lang_id(sample):
    got = {r["id"]: r["l"] for r in
           sample.select("id", X.lang_id(F.col("text")).alias("l")).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_score_bounds(sample):
    vals = [r["q"] for r in
            sample.select(X.quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "id bigint, text string"
    )
    got = {r["id"]: r["f"] for r in
           df.select("id", X.doc_fingerprint(F.col("text")).alias("f")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]  # order matters (rolling hash)


def test_duckdb_twin_parity(spark):
    """All SQL twins produce identical values on the real documents table."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("tc"),
        X.quality_score(F.col("text")).alias("q"),
        X.lang_id(F.col("text")).alias("lang"),
        X.doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    duck = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT doc_id, {X.token_count_sql('text')}, {X.quality_score_sql('text')},"
            f" {X.lang_id_sql('text')}, {X.doc_fingerprint_sql('text')} FROM documents"
        ).fetchall()
    }
    for r in got:
        assert duck[r["doc_id"]] == (r["tc"], r["q"], r["lang"], r["fp"])


def test_distinct_token_ratio(spark):
    from ml_hadoop_experiment_spark.functions.text import distinct_token_ratio

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a b a b")], "id bigint, t string"
    )
    got = {r["id"]: r["r"]
           for r in df.select("id", distinct_token_ratio(F.col("t")).alias("r")).collect()}
    assert got == {1: 0.25, 2: 1.0, 3: 0.5}
