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
