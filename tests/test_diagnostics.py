"""Pipeline diagnostics (operators/diagnostics.py): skew reports,
snapshot diffs, data-quality audits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.diagnostics import (
    dq_audit,
    skew_report,
    snapshot_diff,
)


class TestSkewReport:
    def _df(self, spark):
        # key 1 x6, key 2 x2, keys 3..6 x1 each -> total 12 rows, 6 keys
        rows = [(1,)] * 6 + [(2,)] * 2 + [(k,) for k in (3, 4, 5, 6)]
        return spark.createDataFrame(rows, "k long")

    def test_values(self, spark):
        out = skew_report(self._df(spark), ["k"], top_n=3).collect()
        assert [r["k"] for r in out] == [1, 2, 3]
        top = out[0]
        assert top["cnt"] == 6
        assert top["share"] == 6 / 12
        assert top["skew_factor"] == 6 * 6 / 12  # 3x the fair share
        assert top["salt_factor"] == 3  # ceil(3.0)
        assert out[1]["salt_factor"] == 1  # ceil(2*6/12) = 1
        # uniform keys sit exactly at factor 0.5 -> salt 1 (never 0)
        assert out[2]["skew_factor"] == 0.5 and out[2]["salt_factor"] == 1

    def test_tie_order_is_total(self, spark):
        # keys 3..6 all have cnt=1; the k-ascending tiebreak pins row 3
        out = skew_report(self._df(spark), ["k"], top_n=4).collect()
        assert [r["k"] for r in out] == [1, 2, 3, 4]

    def test_single_scan_plan(self, spark):
        df = self._df(spark)
        out = skew_report(df, ["k"], top_n=3)
        out.collect()  # AQE finalizes the reuse only at execution
        plan = out._jdf.queryExecution().executedPlan().toString()
        # grand totals must reduce the per-key exchange, not re-scan
        assert "ReusedExchange" in plan
        assert "TakeOrderedAndProject" in plan

    def test_multi_column_key(self, spark):
        df = spark.createDataFrame(
            [(1, "a")] * 3 + [(1, "b"), (2, "a")], "k long, s string"
        )
        out = skew_report(df, ["k", "s"], top_n=2).collect()
        assert (out[0]["k"], out[0]["s"], out[0]["cnt"]) == (1, "a", 3)


class TestSnapshotDiff:
    def test_classification_matrix(self, spark):
        old = spark.createDataFrame(
            [(1, "same"), (2, "old-text"), (3, "gone"), (5, None)],
            "id long, v string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "new-text"), (4, "fresh"), (5, None)],
            "id long, v string",
        )
        got = {
            r["id"]: r["change"]
            for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
        }
        # 1 unchanged (no row), 5 null==null unchanged (no row)
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_null_vs_empty_vs_absent(self, spark):
        old = spark.createDataFrame([(1, None), (2, "")], "id long, v string")
        new = spark.createDataFrame([(1, ""), (2, None)], "id long, v string")
        got = {
            r["id"]: r["change"]
            for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
        }
        assert got == {1: "changed", 2: "changed"}

    def test_multi_value_cols_any_change_counts(self, spark):
        old = spark.createDataFrame([(1, "a", "x")], "id long, u string, v string")
        new = spark.createDataFrame([(1, "a", "y")], "id long, u string, v string")
        out = snapshot_diff(old, new, ["id"], ["u", "v"]).collect()
        assert [(r["id"], r["change"]) for r in out] == [(1, "changed")]

    def test_identical_snapshots_empty(self, spark):
        df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
        assert snapshot_diff(df, df, ["id"], ["v"]).count() == 0

    def test_single_exchange_plan(self, spark):
        import re

        df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
        out = snapshot_diff(df, df.limit(10), ["id"], ["v"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one hash exchange on the key; payloads never shuffle twice
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


class TestDqAudit:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, 200.0), (4, None)],
            "id long, amount double",
        )

    def test_counts(self, spark):
        out = {
            r["rule"]: (r["violations"], r["checked"])
            for r in dq_audit(
                self._df(spark),
                [
                    ("negative_amount", F.col("amount") < 0),
                    ("amount_too_big", F.col("amount") > 100),
                    ("null_amount", F.col("amount").isNull()),
                    ("never_fires", F.lit(False)),
                ],
            ).collect()
        }
        # NULL predicate results (row 4 vs the < / > rules) are
        # non-violations, the three-valued SQL convention
        assert out == {
            "negative_amount": (1, 4),
            "amount_too_big": (1, 4),
            "null_amount": (1, 4),
            "never_fires": (0, 4),
        }

    def test_empty_input_zeroes(self, spark):
        df = self._df(spark).where(F.lit(False))
        out = dq_audit(df, [("any", F.col("amount") < 0)]).collect()
        assert [(r["violations"], r["checked"]) for r in out] == [(0, 0)]

    def test_duplicate_rule_names_rejected(self, spark):
        with pytest.raises(ValueError, match="duplicate"):
            dq_audit(
                self._df(spark),
                [("r", F.lit(True)), ("r", F.lit(False))],
            )

    def test_no_rules_rejected(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            dq_audit(self._df(spark), [])

    def test_single_scan_plan(self, spark):
        import re

        out = dq_audit(
            self._df(spark),
            [("a", F.col("amount") < 0), ("b", F.col("amount") > 100)],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the only exchange is the one-row partial-agg combine
        assert len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)) == 1
        assert "SinglePartition" in plan
