"""r14: the SimHash fingerprint moved from a ~1.5k-node codegen
expression (32 HOF filter scans per fingerprint) to one Arrow
``pandas_udf`` projection (guide §4.2/§7.3). These tests pin the ONLY
thing that rewrite is allowed to change — evaluation strategy — by
checking bit-identity against the retained expression form on the real
fixture corpus and on crafted whitespace/empty/null edge cases.

Tokenization deliberately stays in the JVM (``split(trim(lower(col)),
'\\s+')`` feeds the UDF), so split/trim/lower semantics cannot drift:
only the md5/sha256 + vote kernel moved to numpy. The Arrow form lives
in its OWN module (operators/simhash_fp.py) so operators/dedup.py —
whose module fingerprint covers the whole MinHash family — stays
byte-identical to its r13-verified state; ``dedup.simhash`` IS the
retained expression form and the yardstick here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.dedup import (
    simhash as simhash_codegen_expr,
)
from ml_hadoop_experiment_spark.operators.simhash_fp import simhash

#: whitespace-shape edge cases: F.trim strips 0x20 only, Java's \s is
#: [ \t\n\x0B\f\r], and split(limit=-1) KEEPS leading/trailing empty
#: tokens — every case below exercises one of those contracts (the
#: empty token hashes md5("") and votes like any other)
EDGE_TEXTS = [
    None,
    "",
    " ",
    "   ",
    "a",
    "a b",
    "A  B",
    "a\tb",
    "\ta b ",
    "ab\t",
    "x\x0by\fz\rq\nw",
    "same same same different",
    "The  QUICK   brown\tfox",
    " leading and trailing  ",
    "a " * 50 + "b",
]


class TestSimhashArrowEquivalence:
    @pytest.mark.parametrize("bits", [16, 32])
    def test_fixture_corpus_bit_identical(self, spark, sf_dir, bits):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        both = docs.select(
            simhash(F.col("text"), bits).alias("arrow"),
            simhash_codegen_expr(F.col("text"), bits).alias("expr"),
        )
        bad = both.where(F.col("arrow") != F.col("expr")).count()
        assert bad == 0
        # and the fingerprints are non-trivial (not all zero)
        assert both.where(F.col("arrow") != 0).count() > 0

    @pytest.mark.parametrize("bits", [16, 32, 63])
    def test_edge_cases_bit_identical(self, spark, bits):
        df = spark.createDataFrame(
            [(t,) for t in EDGE_TEXTS], "text string"
        )
        rows = df.select(
            "text",
            simhash(F.col("text"), bits).alias("arrow"),
            simhash_codegen_expr(F.col("text"), bits).alias("expr"),
        ).collect()
        for r in rows:
            assert r["arrow"] == r["expr"], (bits, r["text"])

    def test_null_text_is_zero(self, spark):
        df = spark.createDataFrame([(None,)], "text string")
        assert df.select(simhash(F.col("text"), 32)).head()[0] == 0

    def test_single_arrow_eval_in_block_frame(self, spark, sf_dir):
        """The block frame references the fingerprint 4x (one shiftright
        per pigeonhole segment); the plan must still evaluate the UDF
        ONCE — one ArrowEvalPython node carrying one pythonUDF — or the
        rewrite quietly quadruples the hashing work (guide §4.4)."""
        from ml_hadoop_experiment_spark.operators.dedup import (
            _simhash_block_frame,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fp = docs.select(
            F.col("doc_id").alias("id"),
            simhash(F.col("text"), 32).alias("fp"),
        )
        frame = _simhash_block_frame(fp, bits=32, max_hamming=3)
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, plan
        assert "BatchEvalPython" not in plan, plan
