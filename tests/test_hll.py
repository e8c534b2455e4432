"""HyperLogLog sketch: cross-engine estimator identity, accuracy
envelope, register-bounded state, and the correction branch."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


class TestHllAudit:
    def test_matches_duckdb_twin_bit_for_bit(self, spark):
        from ml_hadoop_experiment_spark.operators.hll import (
            hll_audit,
            hll_audit_sql,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/orders.parquet')"
        )
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        for p in (8, 12):
            s = tuple(hll_audit(orders, F.col("o_orderkey"), p=p).collect()[0])
            d = con.execute(hll_audit_sql("orders", "o_orderkey", p=p)).fetchone()
            assert s == d, (p, s, d)
        con.close()

    def test_accuracy_within_sketch_envelope(self, spark):
        """|rel_err| should sit within ~4 sigma of the HLL bound
        1.04/sqrt(m) — a broken estimator (wrong rho, wrong alpha,
        missing correction) lands far outside."""
        from ml_hadoop_experiment_spark.operators.hll import hll_audit

        df = spark.range(20000).select(F.col("id").alias("v"))
        row = hll_audit(df, F.col("v"), p=8).collect()[0]
        assert row["n_exact"] == 20000
        assert abs(row["rel_err"]) < 4 * 1.04 / (256**0.5)

    def test_small_range_correction_branch(self, spark):
        """Tiny cardinalities must route through linear counting: the
        raw harmonic estimate at 7 distinct values over 256 registers
        is heavily biased; the corrected estimate lands within 1."""
        from ml_hadoop_experiment_spark.operators.hll import hll_audit

        df = spark.createDataFrame([(i % 7,) for i in range(1000)], "v bigint")
        row = hll_audit(df, F.col("v"), p=8).collect()[0]
        assert row["n_exact"] == 7
        assert abs(row["n_est"] - 7) < 1.0

    def test_register_rows_bounded_and_duplicate_invariant(self, spark):
        """The sketch state is at most m rows, and duplicating every
        input row leaves it IDENTICAL (distinct-count semantics come
        from the max-merge, not from any pre-distinct)."""
        from ml_hadoop_experiment_spark.operators.hll import hll_register_rows

        base = spark.range(5000).select(F.col("id").alias("v"))
        doubled = base.union(base)
        r1 = sorted(map(tuple, hll_register_rows(base, F.col("v"), 8).collect()))
        r2 = sorted(map(tuple, hll_register_rows(doubled, F.col("v"), 8).collect()))
        assert r1 == r2
        assert len(r1) <= 256

    def test_nulls_ignored_and_p_validated(self, spark):
        from ml_hadoop_experiment_spark.operators.hll import hll_audit

        df = spark.createDataFrame([(1,), (2,), (None,)], "v bigint")
        row = hll_audit(df, F.col("v"), p=8).collect()[0]
        assert row["n_exact"] == 2
        with pytest.raises(ValueError, match="multiple of 4"):
            hll_audit(df, F.col("v"), p=10)
