"""KMV overlap estimation: small-set exactness, crafted overlaps,
estimator sanity on large sets, and the DuckDB twin."""

from __future__ import annotations

import pytest


class TestKmvOverlap:
    def test_small_sets_degrade_to_exact(self, spark):
        """Sets below k keep their whole hash set: every estimate must
        equal the exact value."""
        from ml_hadoop_experiment_spark.operators.setsketch import kmv_overlap

        rows = (
            [("a", i) for i in range(10)]
            + [("b", i) for i in range(5, 15)]  # |A ∩ B| = 5, |A ∪ B| = 15
            + [("c", i) for i in range(100, 103)]  # disjoint from a, b
        )
        df = spark.createDataFrame(rows, "t string, v long")
        out = {
            (r["set_a"], r["set_b"]): r
            for r in kmv_overlap(df, "t", "v", k=64).collect()
        }
        ab = out[("a", "b")]
        assert ab["jaccard_est"] == round(5 / 15, 6) == ab["jaccard_exact"]
        assert ab["union_est"] == 15.0
        assert ab["intersect_est"] == 5.0 == ab["intersect_exact"]
        ac = out[("a", "c")]
        assert ac["n_both"] == 0 and ac["jaccard_exact"] == 0.0
        assert ac["intersect_exact"] == 0

    def test_large_set_estimates_are_sane(self, spark):
        """Above k the estimator arm runs: union/intersection estimates
        must land within a loose band of truth (k=64 -> ~12% std err)."""
        from ml_hadoop_experiment_spark.operators.setsketch import kmv_overlap

        rows = [("a", i) for i in range(2000)] + [
            ("b", i) for i in range(1000, 3000)
        ]  # exact: union 3000, intersection 1000, jaccard 1/3
        df = spark.createDataFrame(rows, "t string, v long")
        r = kmv_overlap(df, "t", "v", k=64).collect()[0]
        assert 2000 < r["union_est"] < 4500
        assert 0.15 < r["jaccard_est"] < 0.55
        assert r["jaccard_exact"] == round(1000 / 3000, 6)

    def test_duplicates_do_not_change_sets(self, spark):
        from ml_hadoop_experiment_spark.operators.setsketch import kmv_overlap

        base = [("a", i) for i in range(10)] + [("b", i) for i in range(10)]
        df1 = spark.createDataFrame(base, "t string, v long")
        df2 = spark.createDataFrame(base * 5, "t string, v long")
        r1 = sorted(map(tuple, kmv_overlap(df1, "t", "v", k=8).collect()))
        r2 = sorted(map(tuple, kmv_overlap(df2, "t", "v", k=8).collect()))
        assert r1 == r2

    def test_string_mode_matches_duckdb(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.setsketch import (
            kmv_overlap,
            kmv_overlap_sql,
        )

        rows = [("a", f"tok{i}") for i in range(300)] + [
            ("b", f"tok{i}") for i in range(150, 450)
        ]
        df = spark.createDataFrame(rows, "t string, v string")
        s = sorted(
            map(
                tuple,
                kmv_overlap(df, "t", "v", k=32, hash_mode="string").collect(),
            )
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE r (t VARCHAR, v VARCHAR)")
        con.executemany("INSERT INTO r VALUES (?, ?)", rows)
        d = sorted(
            map(
                tuple,
                con.execute(
                    kmv_overlap_sql("r", "t", "v", k=32, hash_mode="string")
                ).fetchall(),
            )
        )
        con.close()
        assert s == d

    def test_guards(self, spark):
        from ml_hadoop_experiment_spark.operators.setsketch import (
            kmv_overlap,
            kmv_overlap_sql,
        )

        df = spark.createDataFrame([("a", 1)], "t string, v long")
        with pytest.raises(ValueError, match="k >= 2"):
            kmv_overlap(df, "t", "v", k=1)
        with pytest.raises(ValueError, match="hash_mode"):
            kmv_overlap(df, "t", "v", hash_mode="xx")
        with pytest.raises(ValueError, match="hash_mode"):
            kmv_overlap_sql("r", "t", "v", hash_mode="xx")
