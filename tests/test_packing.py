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


class TestKeyedMinRank:
    """Single-exchange per-key rank (plans/prefix.with_keyed_min_rank):
    the boundary-chaining cases that matter — keys spanning many
    partitions, tie groups spanning partitions, nulls, and a randomized
    equivalence check against the per-key window definition."""

    def _window_expect(self, pdf):
        exp = pdf.copy()
        exp["rank"] = (
            pdf.groupby("k")["v"].rank(method="min", na_option="top").astype("int64")
        )
        exp["n"] = pdf.groupby("k")["v"].transform("size").astype("int64")
        return exp

    def test_key_spanning_many_partitions(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        # 2 keys x 5000 rows over 16 range partitions: every partition
        # boundary cuts through a key, most cut through tie groups too
        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "k": np.repeat(["a", "b"], 5000),
                "v": rng.integers(0, 50, 10_000),  # heavy ties
            }
        )
        df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=2)).repartition(8)
        out = (
            with_keyed_min_rank(df, ["k"], "v", num_partitions=16)
            .toPandas()
            .sort_values(["k", "v"], ignore_index=True)
        )
        exp = (
            self._window_expect(pdf)
            .sort_values(["k", "v"], ignore_index=True)
        )
        assert (out["rank"].values == exp["rank"].values).all()
        assert (out["n"].values == exp["n"].values).all()

    def test_single_giant_tie_group(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        # one key, one value: the tie group spans EVERY partition; all
        # rows must share rank 1 and n = total
        pdf = pd.DataFrame({"k": ["x"] * 3000, "v": [7] * 3000})
        df = spark.createDataFrame(pdf).repartition(8)
        out = with_keyed_min_rank(df, ["k"], "v", num_partitions=12).toPandas()
        assert (out["rank"] == 1).all()
        assert (out["n"] == 3000).all()

    def test_nulls_rank_lowest_and_count(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        rows = [("a", None), ("a", None), ("a", 1.0), ("a", 2.0), (None, 3.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = with_keyed_min_rank(df, ["k"], "v", num_partitions=4).collect()
        a = {(r["v"], r["rank"], r["n"]) for r in out if r["k"] == "a"}
        # nulls sort first: the two nulls share rank 1, then 3, 4 of n=4
        assert a == {(None, 1, 4), (1.0, 3, 4), (2.0, 4, 4)}
        nk = [(r["rank"], r["n"]) for r in out if r["k"] is None]
        assert nk == [(1, 1)]

    def test_randomized_vs_window_definition(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        rng = np.random.default_rng(13)
        n = 20_000
        pdf = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c", "d"], n),
                "v": rng.integers(0, 200, n),
                "payload": np.arange(n),
            }
        )
        df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=3)).repartition(8)
        out = (
            with_keyed_min_rank(df, ["k"], "v", num_partitions=16)
            .toPandas()
            .sort_values("payload", ignore_index=True)
        )
        exp = self._window_expect(pdf).sort_values("payload", ignore_index=True)
        assert (out["rank"].values == exp["rank"].values).all()
        assert (out["n"].values == exp["n"].values).all()

    def test_auto_partitions_est_shrink_ignores_partition_count(self, spark):
        """The Catalyst size estimate may shrink the range exchange below
        defaultParallelism regardless of the input's CURRENT partition
        count — flooring on partition count (the round-7 guard) disabled
        the shrink for every post-shuffle frame (they all sit at
        spark.sql.shuffle.partitions) and the ``.rdd`` probe eagerly
        materialized upstream AQE stages. The OOM guard lives in the
        passes now (next test): exact pass-1 row counts, retry at full
        parallelism."""
        from ml_hadoop_experiment_spark.plans.prefix import _auto_partitions

        pdf = pd.DataFrame({"k": ["a"] * 64, "v": range(64)})
        # estimate is a few KB -> est-based count is the 2 floor, even for
        # an input fanned out to defaultParallelism partitions
        assert _auto_partitions(spark.createDataFrame(pdf).repartition(4)) == 2
        assert _auto_partitions(spark.createDataFrame(pdf).coalesce(1)) == 2

    def test_summary_pass_dtype_matrix(self, spark):
        """The pass-1 Arrow summary crosses key/value columns of
        arbitrary Spark type through pandas (the round-8 fused form);
        this pins correctness for the types the old JVM aggregation
        handled natively: decimal and timestamp values (ties share the
        min rank), date values with NULLs (nulls-first, counted in n),
        int keys with NULLs (own group), and multi-column keys."""
        import datetime
        import decimal

        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        dec = decimal.Decimal
        df = spark.createDataFrame(
            [("a", dec("1.10")), ("a", dec("1.10")), ("a", dec("2.30")),
             ("b", dec("0.50"))],
            "k string, v decimal(18,2)",
        )
        out = {(r["k"], str(r["v"]), r["rank"], r["n"])
               for r in with_keyed_min_rank(df, ["k"], "v",
                                            num_partitions=3).collect()}
        assert out == {("a", "1.10", 1, 3), ("a", "2.30", 3, 3),
                       ("b", "0.50", 1, 1)}

        t0 = datetime.datetime(2020, 1, 1)
        df = spark.createDataFrame(
            [("a", t0), ("a", t0), ("a", t0 + datetime.timedelta(days=1)),
             ("b", t0)],
            "k string, v timestamp",
        )
        out = {(r["k"], r["v"], r["rank"], r["n"])
               for r in with_keyed_min_rank(df, ["k"], "v",
                                            num_partitions=3).collect()}
        assert out == {("a", t0, 1, 3),
                       ("a", t0 + datetime.timedelta(days=1), 3, 3),
                       ("b", t0, 1, 1)}

        d1, d2 = datetime.date(2020, 1, 1), datetime.date(2020, 1, 2)
        df = spark.createDataFrame(
            [(None, d1), (None, d1), (1, d2), (1, None)], "k int, v date"
        )
        rows = with_keyed_min_rank(df, ["k"], "v", num_partitions=3).collect()
        nullkey = {(r["v"], r["rank"], r["n"]) for r in rows if r["k"] is None}
        assert nullkey == {(d1, 1, 2)}
        k1 = {(r["v"], r["rank"], r["n"]) for r in rows if r["k"] == 1}
        assert k1 == {(None, 1, 2), (d2, 2, 2)}  # NULL value sorts first

        df = spark.createDataFrame(
            [("x", 1, 5), ("x", 1, 5), ("x", 2, 5), ("y", 1, 7),
             (None, None, None)],
            "k1 string, k2 int, v int",
        )
        rows = with_keyed_min_rank(df, ["k1", "k2"], "v",
                                   num_partitions=3).collect()
        got = {(r["k1"], r["k2"], r["v"], r["rank"], r["n"]) for r in rows}
        assert got == {("x", 1, 5, 1, 2), ("x", 2, 5, 1, 1),
                       ("y", 1, 7, 1, 1), (None, None, None, 1, 1)}

    def test_row_guard_redoes_shrunk_exchange(self, spark, monkeypatch):
        """OOM guard: when the estimate-shrunk exchange yields a partition
        whose EXACT row count (from the pass-1 summary, collected anyway)
        exceeds _MAX_SHRUNK_PARTITION_ROWS, the exchange is redone at
        defaultParallelism from the persisted frame — results identical,
        no oversized partition is ever buffered by pass 2."""
        from ml_hadoop_experiment_spark.plans import prefix

        monkeypatch.setattr(prefix, "_MAX_SHRUNK_PARTITION_ROWS", 64)
        n = 1_000
        pdf = pd.DataFrame({"k": ["a"] * n, "v": range(n), "w": [1] * n})
        df = spark.createDataFrame(pdf)
        assert prefix._auto_partitions(df) < 4  # the shrink fires first

        ranked = prefix.with_keyed_min_rank(df, ["k"], "v")
        out = ranked.toPandas().sort_values("v", ignore_index=True)
        assert (out["rank"].values == np.arange(1, n + 1)).all()
        assert (out["n"].values == n).all()
        # the map-only rank pass preserves the redone exchange's layout
        assert ranked.rdd.getNumPartitions() == 4

        summed = prefix.with_global_running_sum(df, ["v"], "w")
        spdf = summed.toPandas().sort_values("v", ignore_index=True)
        assert (spdf["running_sum"].values == np.arange(1, n + 1)).all()
        assert summed.rdd.getNumPartitions() == 4

    def test_byte_guard_redoes_shrunk_exchange(self, spark, monkeypatch):
        """OOM guard, byte half: pass 2 of with_keyed_min_rank buffers the
        FULL row, so a few hundred wide rows can exceed memory while
        passing the row cap. The pass-1 scan (guard armed) measures
        payload bytes via a codegen expression; exceeding
        _MAX_SHRUNK_PARTITION_BYTES redoes the exchange at
        defaultParallelism — results identical."""
        from ml_hadoop_experiment_spark.plans import prefix

        monkeypatch.setattr(prefix, "_MAX_SHRUNK_PARTITION_BYTES", 4096)
        n = 200
        pdf = pd.DataFrame(
            {"k": ["a"] * n, "v": range(n), "payload": ["x" * 200] * n}
        )
        df = spark.createDataFrame(pdf)
        assert prefix._auto_partitions(df) < 4  # the shrink fires first
        # rows stay far under the row cap; only the byte cap trips
        assert n < prefix._MAX_SHRUNK_PARTITION_ROWS

        ranked = prefix.with_keyed_min_rank(df, ["k"], "v")
        out = ranked.toPandas().sort_values("v", ignore_index=True)
        assert (out["rank"].values == np.arange(1, n + 1)).all()
        assert (out["n"].values == n).all()
        assert (out["payload"] == "x" * 200).all()
        assert ranked.rdd.getNumPartitions() == 4

    def test_row_bytes_expr_measures_variable_width(self, spark):
        """The byte-estimate expression counts string/binary payloads by
        octet_length, fixed-width arrays by size*width, and nested types
        by their JSON rendering — NULLs count zero."""
        from ml_hadoop_experiment_spark.plans.prefix import _row_bytes_expr

        df = spark.createDataFrame(
            [(1, "abcd", [1.0, 2.0], {"x": 1}), (2, None, None, None)],
            "id bigint, s string, arr array<double>, m map<string,bigint>",
        )
        got = [
            r["b"]
            for r in df.select(F.col("id"), _row_bytes_expr(df.schema).alias("b"))
            .orderBy("id")
            .collect()
        ]
        # row 1: 8 (id) + 4 (s) + 16 (arr) + len('{"m":{"x":1}}') = 41
        assert got[0] == 8 + 4 + 16 + len('{"m":{"x":1}}')
        # row 2: nulls contribute 0 for s/arr; JSON renders '{}' for m
        assert got[1] == 8 + len("{}")

    def test_single_exchange_plan(self, spark):
        from ml_hadoop_experiment_spark.plans.prefix import with_keyed_min_rank

        pdf = pd.DataFrame({"k": ["a"] * 50 + ["b"] * 50, "v": range(100)})
        plan = (
            with_keyed_min_rank(
                spark.createDataFrame(pdf), ["k"], "v", num_partitions=8
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # ONE range exchange moves the table, pinned in the cached frame
        # (the plan dump prints it twice: AQE Final + Initial); above the
        # cache the rank pass is map-only — no hash exchange, no join, no
        # single-partition window anywhere
        consumer = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in consumer, plan
        assert "Exchange" not in consumer, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Exchange SinglePartition" not in plan, plan
        assert "Join" not in plan, plan


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
