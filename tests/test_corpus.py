"""Corpus statistics: TF-IDF top-k terms."""

from __future__ import annotations

import math

import pytest

from ml_hadoop_experiment_spark.operators.corpus import tfidf_topk_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_golden(docs):
    out = tfidf_topk_terms(docs, "doc_id", "text", k=2).collect()
    got = {(r["id"], r["rk"]): (r["token"], r["tfidf"]) for r in out}

    def tfidf(tf, df):
        return round(tf * (math.log((3 + 1) / (df + 1)) + 1), 6)

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert got[(1, 1)] == ("apple", tfidf(2, 1))
    assert got[(1, 2)] == ("banana", tfidf(1, 2))
    # doc 2: banana and cherry tie (tf=1, df=2) -> token order breaks it
    assert got[(2, 1)] == ("banana", tfidf(1, 2))
    assert got[(2, 2)] == ("cherry", tfidf(1, 2))
    # doc 3: cherry tf=3 beats durian (rare but tf=1)
    assert got[(3, 1)] == ("cherry", tfidf(3, 2))
    assert got[(3, 2)] == ("durian", tfidf(1, 1))


def test_tfidf_k_validation_and_scalar_broadcast(docs):
    with pytest.raises(ValueError, match="k must be positive"):
        tfidf_topk_terms(docs, "doc_id", "text", k=0)
    plan = (
        tfidf_topk_terms(docs, "doc_id", "text", k=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-size scalar joins via broadcast, never a shuffle
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
