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


def test_redact_pii_spans(spark):
    """Each rule redacts its span; surrounding text survives; tag order
    protects SSNs from the phone rule."""
    from ml_hadoop_experiment_spark.functions.text import redact_pii

    rows = [
        (1, "mail me at john.doe+spam@sub.example.co.uk today"),
        (2, "ssn 123-45-6789 and phone +44 020-7946-0958"),
        (3, "server at 192.168.0.1 port 8080"),
        (4, "card 4111 1111 1111 1111 expires soon"),
        (5, "no pii in this sentence at all"),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    got = {r["id"]: r["r"] for r in
           df.select("id", redact_pii(F.col("t")).alias("r")).collect()}
    assert got[1] == "mail me at [EMAIL] today"
    assert got[2].startswith("ssn [SSN] and phone ")
    assert "[PHONE]" in got[2]
    assert got[3] == "server at [IPV4] port 8080"
    assert got[4] == "card [CARD] expires soon"
    assert got[5] == rows[4][1]


def test_redact_pii_sql_twin_agrees(spark):
    """Differential: Java regex (Spark) and RE2 (DuckDB) replace identical
    spans for every rule on a mixed corpus."""
    import duckdb

    from ml_hadoop_experiment_spark.functions.text import redact_pii, redact_pii_sql

    texts = [
        "a@b.io x 1.2.3.4 y 999-99-9999 z +1 555-123-4567 w 1234 5678 9012 3456",
        "no matches here",
        "edge a@@b.com 256.1.1.1 12-34-5678 +123 456 789",
        "two emails a@x.org b@y.net and two ips 10.0.0.1 10.0.0.2",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id bigint, t string")
    got = {r["id"]: r["r"] for r in
           df.select("id", redact_pii(F.col("t")).alias("r")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        duck = con.execute(f"SELECT {redact_pii_sql('?::VARCHAR')}", [t]).fetchone()[0]
        assert duck == got[i], f"row {i}: spark={got[i]!r} duck={duck!r}"
