"""Heavy hitters: MG candidate generation bound + exact recount."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.heavy_hitters import (
    heavy_hitters,
    mg_candidates,
)


def _zipf_tokens(spark, n=50_000, vocab=5_000, seed=5, partitions=8):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n) % vocab
    pdf = pd.DataFrame({"tok": [f"w{r}" for r in ranks]})
    return spark.createDataFrame(pdf).repartition(partitions), pdf


class TestHeavyHitters:
    def test_exact_vs_full_groupby(self, spark):
        """The two-pass result equals the naive full aggregation top-k."""
        df, pdf = _zipf_tokens(spark)
        got = heavy_hitters(df, "tok", k=15, capacity=512).toPandas()
        truth = (
            pdf["tok"]
            .value_counts()
            .rename_axis("token")
            .reset_index(name="n")
            .sort_values(["n", "token"], ascending=[False, True])
            .head(15)
        )
        assert got["token"].tolist() == truth["token"].tolist()
        assert got["n_occurrences"].tolist() == truth["n"].tolist()

    def test_guarantee_flag_certifies_topk(self, spark):
        df, pdf = _zipf_tokens(spark)
        got = heavy_hitters(df, "tok", k=10, capacity=512).toPandas()
        # zipf-1.3 head counts far exceed N/512: every row certified
        assert got["guaranteed"].all()

    def test_candidate_summary_is_bounded(self, spark):
        df, _ = _zipf_tokens(spark, partitions=4)
        per_part = (
            mg_candidates(df, "tok", capacity=64)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .toPandas()
        )
        assert (per_part["count"] <= 64).all()

    def test_mg_never_misses_frequent_item(self, spark):
        """Adversarial spread: one token at ~1% frequency distributed
        evenly across partitions must appear in the candidate union
        (capacity 256 -> bound 1/256 < 1%)."""
        n = 40_000
        filler = [f"rare{i}" for i in range(n - 400)]
        pdf = pd.DataFrame({"tok": filler + ["target"] * 400})
        df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=0)).repartition(8)
        cands = set(
            r["token"]
            for r in mg_candidates(df, "tok", capacity=256).select("token").collect()
        )
        assert "target" in cands

    def test_null_tokens_ignored(self, spark):
        pdf = pd.DataFrame({"tok": ["a", "a", None, "b"]})
        got = heavy_hitters(spark.createDataFrame(pdf), "tok", k=5, capacity=16)
        out = got.toPandas()
        assert out["token"].tolist() == ["a", "b"]
        assert out["n_occurrences"].tolist() == [2, 1]
