"""Chunking, concat-packing, and the two-phase global prefix sum."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.packing import (
    chunk_documents,
    concat_pack,
)
from ml_hadoop_experiment_spark.plans.prefix import with_global_running_sum


class TestGlobalRunningSum:
    def test_equals_sequential_cumsum(self, spark):
        rng = np.random.default_rng(6)
        pdf = pd.DataFrame({"k": np.arange(20_000), "v": rng.integers(1, 100, 20_000)})
        # scramble input partitioning; order key restores the total order
        df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=1)).repartition(16)
        out = (
            with_global_running_sum(df, ["k"], "v", num_partitions=8)
            .toPandas()
            .sort_values("k", ignore_index=True)
        )
        expect = pdf.sort_values("k", ignore_index=True)["v"].cumsum()
        assert (out["running_sum"].values == expect.values).all()

    def test_no_single_partition_exchange(self, spark):
        pdf = pd.DataFrame({"k": range(100), "v": [1] * 100})
        plan = (
            with_global_running_sum(
                spark.createDataFrame(pdf), ["k"], "v", num_partitions=8
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange SinglePartition" not in plan, plan


class TestChunkDocuments:
    def test_chunk_boundaries_and_overlap(self, spark):
        words = " ".join(f"w{i}" for i in range(300))
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [words]}))
        out = (
            chunk_documents(df, "doc_id", "text", chunk_tokens=128, overlap=16)
            .toPandas()
            .sort_values("chunk_id", ignore_index=True)
        )
        # stride 112: starts 0,112,224 -> 3 chunks; last is 300-224=76 tokens
        assert out["chunk_id"].tolist() == [0, 1, 2]
        assert out["n_tokens"].tolist() == [128, 128, 76]
        c0 = out.loc[0, "chunk_text"].split()
        c1 = out.loc[1, "chunk_text"].split()
        assert c0[-16:] == c1[:16]  # overlap carries context
        assert c1[0] == "w112"

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["only four words here"]})
        )
        out = chunk_documents(df, "doc_id", "text", chunk_tokens=128, overlap=16).toPandas()
        assert len(out) == 1
        assert out.loc[0, "chunk_text"] == "only four words here"
        assert out.loc[0, "n_tokens"] == 4

    def test_every_token_covered(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": [" ".join(map(str, range(1000)))]})
        )
        out = chunk_documents(df, "doc_id", "text", chunk_tokens=64, overlap=8).toPandas()
        seen = set()
        for t in out["chunk_text"]:
            seen.update(t.split())
        assert seen == set(map(str, range(1000)))


class TestConcatPack:
    def test_bins_fill_to_budget(self, spark):
        pdf = pd.DataFrame({"doc_id": range(100), "n": [300] * 100})
        out = (
            concat_pack(spark.createDataFrame(pdf), "doc_id", "n", budget=1000)
            .toPandas()
            .sort_values("id", ignore_index=True)
        )
        # exclusive cumsum of 300s: doc k starts at 300k; bin = 300k div 1000
        assert (out["bin"].values == (np.arange(100) * 300) // 1000).all()
        assert (out["bin_offset"].values == (np.arange(100) * 300) % 1000).all()
        # docs straddling a 1000-boundary are flagged (e.g. 900..1199)
        spans = out[out["spans_boundary"]]["id"].tolist()
        assert 3 in spans and 0 not in spans

    def test_total_tokens_conserved(self, spark):
        rng = np.random.default_rng(8)
        pdf = pd.DataFrame({"doc_id": range(500), "n": rng.integers(1, 400, 500)})
        out = concat_pack(spark.createDataFrame(pdf), "doc_id", "n", budget=2048).toPandas()
        assert out["n_tokens"].sum() == pdf["n"].sum()
        # every bin except the last holds exactly... boundary docs straddle,
        # so per-bin sums of STARTING docs are within one doc of the budget
        last_bin = out["bin"].max()
        for b, grp in out.groupby("bin"):
            if b < last_bin:
                start_span = grp["bin_offset"].min()
                assert start_span < 2048


class TestGlobalRank:
    def test_matches_window_row_number(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_global_rank

        rng = np.random.default_rng(12)
        pdf = pd.DataFrame({"k": rng.permutation(5000), "v": rng.normal(size=5000)})
        df = spark.createDataFrame(pdf).repartition(16)
        out = (
            with_global_rank(df, ["v", "k"], num_partitions=8)
            .toPandas()
            .sort_values("k", ignore_index=True)
        )
        expect = (
            pdf.sort_values(["v", "k"])
            .assign(rank=np.arange(1, 5001))
            .sort_values("k", ignore_index=True)
        )
        assert (out["rank"].values == expect["rank"].values).all()
