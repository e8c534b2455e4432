"""Compression-ratio quality signal (operators/quality.py)."""

from __future__ import annotations

import zlib

import pytest

from ml_hadoop_experiment_spark.operators.quality import compression_ratio


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spam spam spam " * 50),                      # boilerplate
        (2, "The quarterly review considered supply-chain exposure, "
            "hedging strategy, and regional demand elasticity."),  # prose
        (3, "qZ3#kV9@mX1!pL7$wN5%rT2^bH8&cJ4*"),          # high entropy
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "id bigint, text string")


def test_golden_matches_local_zlib(docs):
    out = {r["id"]: r["compression_ratio"]
           for r in compression_ratio(docs, "text").collect()}
    rows = {r["id"]: r["text"] for r in docs.collect()}
    for i in (1, 2, 3):
        raw = rows[i].encode("utf-8")
        assert out[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert out[4] is None and out[5] is None  # null and empty -> NULL


def test_tails_separate(docs):
    out = {r["id"]: r["compression_ratio"]
           for r in compression_ratio(docs, "text").collect()}
    # boilerplate compresses hard; gibberish barely compresses
    assert out[1] < 0.2
    assert out[1] < out[2] < out[3]
    assert out[3] > 0.9


def test_arrow_batched_not_row_at_a_time(docs):
    plan = (
        compression_ratio(docs, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_level_validation(docs):
    with pytest.raises(ValueError, match="zlib level"):
        compression_ratio(docs, "text", level=11)
