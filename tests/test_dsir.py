"""DSIR importance weights: target-like ordering, smoothing totality,
the DuckDB twin, and the vocabulary-bounded plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

RAW = [
    (1, "stocks rose on friday markets rally"),
    (2, "the cat sat on the mat"),
    (3, "markets fell as stocks dropped"),
    (4, "dogs and cats are pets"),
]
TGT = [
    (9, "markets stocks trading rally dividends"),
    (10, "stocks markets fell rose"),
]


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(RAW, "doc_id int, text string"),
        spark.createDataFrame(TGT, "doc_id int, text string"),
    )


class TestDsirWeights:
    def test_target_like_docs_outscore(self, spark, frames):
        from ml_hadoop_experiment_spark.operators.dsir import dsir_weights

        raw, tgt = frames
        w = {
            r["id"]: r["logratio"]
            for r in dsir_weights(raw, tgt, "doc_id", "text").collect()
        }
        # finance docs (1, 3) resemble the finance target; pet docs
        # (2, 4) must score strictly lower
        assert min(w[1], w[3]) > max(w[2], w[4])
        # every raw doc gets a weight (smoothing totality: no token
        # missing from the target can NULL a score)
        assert set(w) == {1, 2, 3, 4}

    def test_duckdb_twin(self, spark, frames):
        from ml_hadoop_experiment_spark.operators.dsir import (
            dsir_weights,
            dsir_weights_sql,
        )

        raw, tgt = frames
        sp = (
            dsir_weights(raw, tgt, "doc_id", "text")
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("raw", pd.DataFrame(RAW, columns=["doc_id", "text"]))
        con.register("tgt", pd.DataFrame(TGT, columns=["doc_id", "text"]))
        du = (
            con.execute(dsir_weights_sql("raw", "tgt", "doc_id", "text"))
            .df()
            .sort_values("id")
            .reset_index(drop=True)
        )
        for c in ["id", "n_tokens", "logratio"]:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c

    def test_no_python_crossing_and_broadcast_totals(self, spark, frames):
        from ml_hadoop_experiment_spark.operators.dsir import dsir_weights
        from ml_hadoop_experiment_spark.plans.optimize import (
            executed_plan_str,
        )

        raw, tgt = frames
        plan = executed_plan_str(dsir_weights(raw, tgt, "doc_id", "text"))
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert marker not in plan
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


class TestDsirResample:
    def test_resample_contract_and_duckdb_twin(self, spark, frames):
        from ml_hadoop_experiment_spark.operators.dsir import (
            dsir_resample,
            dsir_resample_sql,
        )

        raw, tgt = frames
        sp = (
            dsir_resample(raw, tgt, "doc_id", "text", k=2)
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert len(sp) == 2
        # every sampled row carries the audit columns, and est_weight
        # is at least the raw weight (the tau floor)
        assert set(sp.columns) == {
            "id", "n_tokens", "logratio", "score", "priority_key",
            "est_weight",
        }
        con = duckdb.connect()
        con.register("raw", pd.DataFrame(RAW, columns=["doc_id", "text"]))
        con.register("tgt", pd.DataFrame(TGT, columns=["doc_id", "text"]))
        du = (
            con.execute(
                dsir_resample_sql("raw", "tgt", "doc_id", "text", k=2)
            )
            .df()
            .sort_values("id")
            .reset_index(drop=True)
        )
        for c in sp.columns:
            assert list(sp[c].astype(str)) == list(du[c].astype(str)), c

    def test_k_at_population_returns_all_with_raw_weights(
        self, spark, frames
    ):
        from ml_hadoop_experiment_spark.operators.dsir import dsir_resample

        raw, tgt = frames
        got = dsir_resample(raw, tgt, "doc_id", "text", k=10).collect()
        # fewer than k+1 finalists -> no threshold: est_weight == w
        assert len(got) == 4
        import math

        for r in got:
            w = round(math.exp(r["score"]), 6)
            assert abs(r["est_weight"] - w) < 1e-12
