"""CCNet perplexity bucketing (operators/ccnet.py): bucket semantics,
equal-population split, label mapping, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

CORPUS = [
    # common words score low xent; rare-word docs score high
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "the cat and the dog"),
    (4, "quantum chromodynamics lattice"),
    (5, "zygomorphic perianth xylem phloem"),
    (6, "the the the the"),
    (7, "cat dog mat rug"),
    (8, "on and the cat"),
    (9, "esoteric abstruse recondite"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


class TestPerplexityBuckets:
    def test_buckets_partition_the_corpus(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.ccnet import (
            perplexity_buckets,
        )

        rows = perplexity_buckets(docs, "doc_id", "text").collect()
        assert len(rows) == len(CORPUS)
        by_bucket = {}
        for r in rows:
            assert r["bucket"] in (0, 1, 2)
            assert r["bucket_label"] == ("head", "middle", "tail")[r["bucket"]]
            by_bucket.setdefault(r["bucket"], []).append(r["xent"])
        # equal-population thirds on 9 distinct-xent docs -> 3/3/3
        assert sorted(len(v) for v in by_bucket.values()) == [3, 3, 3]
        # ordering: every head xent <= every middle <= every tail
        assert max(by_bucket[0]) <= min(by_bucket[1])
        assert max(by_bucket[1]) <= min(by_bucket[2])

    def test_label_arity_validated(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.ccnet import (
            perplexity_buckets,
            perplexity_buckets_sql,
        )

        with pytest.raises(ValueError, match="num_buckets"):
            perplexity_buckets(docs, "doc_id", "text", num_buckets=4)
        with pytest.raises(ValueError, match="num_buckets"):
            perplexity_buckets_sql("t", "id", "txt", num_buckets=2)

    def test_duckdb_twin(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.ccnet import (
            perplexity_buckets,
            perplexity_buckets_sql,
        )

        got = sorted(
            (r["id"], r["n_tokens"], r["xent"], r["bucket"],
             r["bucket_label"])
            for r in perplexity_buckets(docs, "doc_id", "text").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE d(doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", CORPUS)
        want = sorted(
            con.execute(
                perplexity_buckets_sql("d", "doc_id", "text")
            ).fetchall()
        )
        assert got == want

    def test_five_way_custom_labels(self, spark, docs):
        from ml_hadoop_experiment_spark.operators.ccnet import (
            perplexity_buckets,
        )

        labels = ["q1", "q2", "q3", "q4", "q5"]
        rows = perplexity_buckets(
            docs, "doc_id", "text", num_buckets=5, labels=labels
        ).collect()
        for r in rows:
            assert r["bucket_label"] == labels[r["bucket"]]
