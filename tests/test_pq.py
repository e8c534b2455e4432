"""Product quantization: geometry contracts, code bounds, recall
sanity against the exact ranking, sample-training determinism, and the
DuckDB full-pipeline twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


class TestPqTrain:
    def test_codebook_geometry(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq import pq_train

        books = pq_train(
            emb, "vec_id", "embedding", 64, n_subspaces=4,
            codebook_k=8, iters=1,
        )
        assert len(books) == 4
        assert all(len(b) == 8 for b in books)
        assert all(len(c) == 16 for b in books for c in b)

    def test_bad_geometry_and_fraction_rejected(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq import pq_train

        with pytest.raises(ValueError, match="split evenly"):
            pq_train(emb, "vec_id", "embedding", 64, n_subspaces=5)
        with pytest.raises(ValueError, match="train_fraction"):
            pq_train(emb, "vec_id", "embedding", 64, train_fraction=0.0)

    def test_fused_trainer_equals_sequential_lloyd(self, spark, emb):
        """pq_train's one-job-per-iteration fused trainer must be
        bit-identical to the per-subspace kmeans_lloyd chains it
        replaced (same init ids, same assignment argmin, exact decimal
        sums, same division/rounding, same empty-cluster rule)."""
        from ml_hadoop_experiment_spark.operators.clustering import (
            kmeans_lloyd,
        )
        from ml_hadoop_experiment_spark.operators.pq import pq_train

        fused = pq_train(
            emb, "vec_id", "embedding", 64, n_subspaces=4,
            codebook_k=8, iters=2, train_fraction=0.5, seed=3,
        )
        from ml_hadoop_experiment_spark.functions.hashing import (
            portable_unit_hash,
        )

        base = emb.where(
            portable_unit_hash(F.col("vec_id"), salt=3) < F.lit(0.5)
        )
        sub_dim = 16
        for s in range(4):
            sub = base.select(
                F.col("vec_id").alias("id"),
                F.slice(
                    F.col("embedding"), s * sub_dim + 1, sub_dim
                ).alias("v"),
            )
            _, cents = kmeans_lloyd(sub, "id", "v", sub_dim, 8, 2)
            assert fused[s] == cents, f"subspace {s} diverged"

    def test_sample_training_is_deterministic(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq import pq_train

        a = pq_train(
            emb, "vec_id", "embedding", 64, codebook_k=8, iters=2,
            train_fraction=0.5, seed=3,
        )
        b = pq_train(
            emb, "vec_id", "embedding", 64, codebook_k=8, iters=2,
            train_fraction=0.5, seed=3,
        )
        assert a == b
        # a materially different sample trains different codebooks
        # (vary the FRACTION: the portable hash's additive salt shifts
        # the unit interval by seed/2^32, so adjacent seeds move almost
        # no membership — fractions move it by construction)
        c = pq_train(
            emb, "vec_id", "embedding", 64, codebook_k=8, iters=2,
            train_fraction=0.25, seed=3,
        )
        assert a != c


class TestPqCodes:
    def test_codes_within_codebook_range(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq import (
            pq_code_expr,
            pq_train,
        )

        books = pq_train(
            emb, "vec_id", "embedding", 64, codebook_k=8, iters=1
        )
        codes = emb.select(
            pq_code_expr(F.col("embedding"), books).alias("codes")
        )
        bad = codes.where(
            F.exists("codes", lambda c: (c < 0) | (c >= 8))
        ).count()
        assert bad == 0
        assert codes.where(F.size("codes") != 4).count() == 0


class TestPqTopk:
    def test_recall_against_exact_ranking(self, spark, emb):
        """PQ is approximate by design; the sanity bar is that its
        top-10 overlaps the exact squared-distance top-20 far above
        chance (>= 4 of 10 on the 500-row fixture — random picks less
        than one)."""
        from ml_hadoop_experiment_spark.operators.pq import pq_topk
        from ml_hadoop_experiment_spark.operators.similarity import (
            squared_distance_expr,
        )

        q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
        exact = [
            r["vec_id"]
            for r in emb.where(F.col("vec_id") != 0)
            .select(
                "vec_id",
                squared_distance_expr(F.col("embedding"), q).alias("d"),
            )
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(20)
            .collect()
        ]
        approx = [
            r["id"]
            for r in pq_topk(
                emb, "vec_id", "embedding", 64, query_id=0, k=10,
                codebook_k=8, iters=2,
            ).collect()
        ]
        assert len(set(approx) & set(exact)) >= 4

    def test_matches_duckdb_full_pipeline(self, spark, emb):
        import duckdb

        from ml_hadoop_experiment_spark.operators.pq import (
            pq_topk,
            pq_topk_sql,
        )

        kwargs = dict(
            dim=64, query_id=0, k=20, n_subspaces=4, codebook_k=8,
            iters=2, train_fraction=0.5, seed=3,
        )
        s = [tuple(r) for r in pq_topk(emb, "vec_id", "embedding", **kwargs).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
        )
        d = con.execute(
            pq_topk_sql("embeddings", "vec_id", "embedding", **kwargs)
        ).fetchall()
        con.close()
        assert s == d

    def test_missing_query_id_raises(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq import pq_topk

        with pytest.raises(ValueError, match="expected 1 row"):
            pq_topk(
                emb, "vec_id", "embedding", 64, query_id=10**9, k=5,
                codebook_k=8, iters=1,
            )
