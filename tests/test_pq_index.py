"""Steady-state PQ index + IVF+PQ composition: index probes must equal
the from-scratch pq_topk bit-for-bit, the routed steady-state path must
equal the one-shot ivf_pq_topk, the composed DuckDB twin must match,
and routing must actually prune."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

PQ_KW = dict(
    dim=64, n_subspaces=4, codebook_k=8, iters=2,
    train_fraction=0.5, seed=3,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]


class TestPqIndex:
    def test_index_probe_equals_from_scratch_pq_topk(self, spark, emb, qvec):
        from ml_hadoop_experiment_spark.operators.pq import pq_topk
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            pq_topk_against_index,
        )

        scratch = [
            tuple(r)
            for r in pq_topk(
                emb, "vec_id", "embedding", query_id=0, k=20, **PQ_KW
            ).collect()
        ]
        idx = build_pq_index(
            emb, "vec_id", "embedding", register=False, **PQ_KW
        )
        try:
            probed = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0
                ).collect()
            ]
        finally:
            idx.unpersist()
        assert probed == scratch

    def test_codes_frame_shape_and_pin(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
        )

        idx = build_pq_index(
            emb, "vec_id", "embedding", register=False, **PQ_KW
        )
        try:
            assert idx.codes.columns == ["id", "code"]
            assert idx.codes.storageLevel.useMemory
            n = idx.codes.count()
            assert n == emb.count()
            bad = idx.codes.where(
                F.exists("code", lambda c: (c < 0) | (c >= 8))
            ).count()
            assert bad == 0
        finally:
            idx.unpersist()

    def test_guards(self, spark, emb, qvec):
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            pq_topk_against_index,
        )

        idx = build_pq_index(
            emb, "vec_id", "embedding", register=False, eager=False, **PQ_KW
        )
        try:
            with pytest.raises(ValueError, match="dims"):
                pq_topk_against_index(idx, qvec[:8], k=5)
            with pytest.raises(ValueError, match="centroids"):
                pq_topk_against_index(idx, qvec, k=5, nprobe=2)
        finally:
            idx.unpersist()


class TestIvfPq:
    def test_one_shot_matches_duckdb_twin(self, spark, emb, qvec):
        import duckdb

        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_topk,
            ivf_pq_topk_sql,
        )

        s = [
            tuple(r)
            for r in ivf_pq_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=20, nprobe=4, **PQ_KW
            ).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/embeddings.parquet')"
        )
        d = con.execute(
            ivf_pq_topk_sql(
                "embeddings", "vec_id", "embedding", FROZEN_CENTROIDS_8X64,
                query_id=0, k=20, nprobe=4, **PQ_KW
            )
        ).fetchall()
        con.close()
        assert s == [tuple(r) for r in d]

    def test_routed_index_equals_one_shot(self, spark, emb, qvec):
        """Steady-state (build once with centroids, probe routed) must
        return exactly the one-shot composition's rows."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            ivf_pq_topk,
            pq_topk_against_index,
        )

        one_shot = [
            tuple(r)
            for r in ivf_pq_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=20, nprobe=4, **PQ_KW
            ).collect()
        ]
        idx = build_pq_index(
            emb, "vec_id", "embedding",
            centroids=FROZEN_CENTROIDS_8X64, register=False, **PQ_KW
        )
        try:
            assert idx.codes.columns == ["id", "list_id", "code"]
            routed = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0, nprobe=4
                ).collect()
            ]
        finally:
            idx.unpersist()
        assert routed == one_shot

    def test_residual_matches_duckdb_twin(self, spark, emb):
        import duckdb

        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_residual_topk,
            ivf_pq_residual_topk_sql,
        )

        s = [
            tuple(r)
            for r in ivf_pq_residual_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=20, nprobe=4, **PQ_KW
            ).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/embeddings.parquet')"
        )
        d = con.execute(
            ivf_pq_residual_topk_sql(
                "embeddings", "vec_id", "embedding", FROZEN_CENTROIDS_8X64,
                query_id=0, k=20, nprobe=4, **PQ_KW
            )
        ).fetchall()
        con.close()
        assert s == [tuple(r) for r in d]

    def test_residual_recall_against_exact_ranking(self, spark, emb, qvec):
        """Residual encoding is the FAISS-default accuracy lever: its
        top-10 must overlap the exact squared-distance top-20 well
        above chance, like the plain-PQ recall bar in test_pq.py."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_residual_topk,
        )
        from ml_hadoop_experiment_spark.operators.similarity import (
            squared_distance_expr,
        )

        exact = [
            r["vec_id"]
            for r in emb.where(F.col("vec_id") != 0)
            .select(
                "vec_id",
                squared_distance_expr(F.col("embedding"), qvec).alias("d"),
            )
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(20)
            .collect()
        ]
        approx = [
            r["id"]
            for r in ivf_pq_residual_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=10, nprobe=8, **PQ_KW
            ).collect()
        ]
        assert len(set(approx) & set(exact)) >= 4

    def test_residual_index_equals_one_shot(self, spark, emb, qvec):
        """Steady-state residual index (train-once/encode-once residual
        codes, routed per-list ADC probes) must return exactly the
        one-shot ivf_pq_residual_topk rows — and unrouted probes
        (tables for every list) must include the same top rows when
        nprobe spans all lists."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            ivf_pq_residual_topk,
            pq_topk_against_index,
        )

        one_shot = [
            tuple(r)
            for r in ivf_pq_residual_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=20, nprobe=4, **PQ_KW
            ).collect()
        ]
        idx = build_pq_index(
            emb, "vec_id", "embedding",
            centroids=FROZEN_CENTROIDS_8X64, by_residual=True,
            register=False, **PQ_KW
        )
        try:
            assert idx.by_residual
            assert idx.codes.columns == ["id", "list_id", "code"]
            routed = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0, nprobe=4
                ).collect()
            ]
            unrouted = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0,
                    nprobe=len(FROZEN_CENTROIDS_8X64),
                ).collect()
            ]
            all_lists = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0
                ).collect()
            ]
        finally:
            idx.unpersist()
        assert routed == one_shot
        assert unrouted == all_lists

    def test_residual_index_requires_centroids(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
        )

        with pytest.raises(ValueError, match="requires centroids"):
            build_pq_index(
                emb, "vec_id", "embedding", by_residual=True,
                register=False, **PQ_KW
            )

    def test_routing_prunes_and_full_probe_degrades_to_pq(
        self, spark, emb, qvec
    ):
        """nprobe below the list count must score strictly fewer
        candidates than the unrouted scan; nprobe = all lists must
        equal plain PQ over the whole corpus."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            pq_topk_against_index,
        )

        idx = build_pq_index(
            emb, "vec_id", "embedding",
            centroids=FROZEN_CENTROIDS_8X64, register=False, **PQ_KW
        )
        try:
            probes = pq_topk_against_index
            total = emb.count()
            from ml_hadoop_experiment_spark.operators.similarity import (
                ivf_probes_fixed,
            )

            routed_lists = ivf_probes_fixed(FROZEN_CENTROIDS_8X64, qvec, 2)
            n_routed = idx.codes.where(
                F.col("list_id").isin(routed_lists)
            ).count()
            assert 0 < n_routed < total
            full = [
                tuple(r)
                for r in probes(
                    idx, qvec, k=20, exclude_id=0,
                    nprobe=len(FROZEN_CENTROIDS_8X64),
                ).collect()
            ]
            unrouted = [
                tuple(r)
                for r in probes(idx, qvec, k=20, exclude_id=0).collect()
            ]
            assert full == unrouted
        finally:
            idx.unpersist()


class TestRoutedStorage:
    def test_stored_probe_equals_memory_probe_and_prunes_files(
        self, spark, emb, qvec, tmp_path
    ):
        """route_index_to_storage: the stored (list-partitioned) index
        must return byte-identical probes to the in-memory routed
        index, and the probe scan must READ only the nprobe list
        partitions (the partition-pruning receipt — files_read)."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            pq_topk_against_index,
            route_index_to_storage,
        )
        from ml_hadoop_experiment_spark.plans.inspect import files_read

        idx = build_pq_index(
            emb, "vec_id", "embedding",
            centroids=FROZEN_CENTROIDS_8X64, register=False, **PQ_KW
        )
        try:
            mem = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0, nprobe=4
                ).collect()
            ]
            stored = route_index_to_storage(idx, str(tmp_path / "routed"))
        finally:
            idx.unpersist()
        probe = pq_topk_against_index(
            stored, qvec, k=20, exclude_id=0, nprobe=4
        )
        assert [tuple(r) for r in probe.collect()] == mem
        # 8 lists on disk; nprobe=4 must scan exactly 4 of them
        assert files_read(probe) == 4
        full = pq_topk_against_index(
            stored, qvec, k=20, exclude_id=0, nprobe=8
        )
        full.collect()
        assert files_read(full) == 8

    def test_storage_requires_centroids(self, spark, emb):
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            route_index_to_storage,
        )

        idx = build_pq_index(
            emb, "vec_id", "embedding", register=False, **PQ_KW
        )
        try:
            with pytest.raises(ValueError, match="centroids"):
                route_index_to_storage(idx, "/tmp/never-written")
        finally:
            idx.unpersist()

    def test_residual_stored_probe_equals_memory(self, spark, emb, qvec, tmp_path):
        """route_index_to_storage must carry by_residual through: the
        stored residual index's routed probes equal the in-memory
        residual index's byte-for-byte, and the per-list ADC tables are
        built from the stored codes' list_id partition column."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            build_pq_index,
            pq_topk_against_index,
            route_index_to_storage,
        )

        idx = build_pq_index(
            emb, "vec_id", "embedding",
            centroids=FROZEN_CENTROIDS_8X64, by_residual=True,
            register=False, **PQ_KW
        )
        try:
            mem = [
                tuple(r)
                for r in pq_topk_against_index(
                    idx, qvec, k=20, exclude_id=0, nprobe=4
                ).collect()
            ]
            stored = route_index_to_storage(
                idx, str(tmp_path / "routed_residual")
            )
        finally:
            idx.unpersist()
        assert stored.by_residual and stored.centroids is not None
        probe = pq_topk_against_index(
            stored, qvec, k=20, exclude_id=0, nprobe=4
        )
        assert [tuple(r) for r in probe.collect()] == mem


class TestRerank:
    """Round-12: PQ shortlist -> exact re-rank (the FAISS refine stage)."""

    def test_rerank_scores_are_exact_cosine_of_shortlist(self, spark, emb, qvec):
        """Every re-ranked row's score must equal the EXACT cosine of
        that vector vs the query (not the quantized ADC score), and the
        result must be the top-k of the shortlist under exact cosine."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_rerank_topk,
            ivf_pq_topk,
        )
        from ml_hadoop_experiment_spark.operators.similarity import (
            cosine_topk,
        )

        got = [
            tuple(r)
            for r in ivf_pq_rerank_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=10, shortlist=50, nprobe=4, **PQ_KW
            ).collect()
        ]
        assert len(got) == 10
        short_ids = {
            r["id"]
            for r in ivf_pq_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=50, nprobe=4, **PQ_KW
            ).collect()
        }
        exact = {
            r["id"]: r["score"]
            for r in cosine_topk(
                emb.where(F.col("vec_id").isin(list(short_ids))),
                qvec, id_col="vec_id", vec_col="embedding", k=50,
            ).collect()
        }
        want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == [(i, s) for i, s in want]

    def test_full_shortlist_recovers_exact_ann(self, spark, emb, qvec):
        """shortlist >= probed-lists size -> the re-rank equals exact
        cosine top-k restricted to the probed lists (recall ceiling of
        the two-stage pattern)."""
        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_rerank_topk,
        )
        from ml_hadoop_experiment_spark.operators.similarity import (
            ivf_topk_fixed,
        )

        n = emb.count()
        got = [
            tuple(r)
            for r in ivf_pq_rerank_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=10, shortlist=int(n), nprobe=4, **PQ_KW
            ).collect()
        ]
        want = [
            (r["id"], r["score"])
            for r in ivf_topk_fixed(
                # the shortlist contract excludes the query row itself
                emb.where(F.col("vec_id") != 0),
                FROZEN_CENTROIDS_8X64, qvec, k=10, nprobe=4,
                id_col="vec_id", vec_col="embedding",
            ).collect()
        ]
        assert got == want

    def test_rejects_k_above_shortlist(self, spark, emb):
        import pytest as _pytest

        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_rerank_topk,
        )

        with _pytest.raises(ValueError):
            ivf_pq_rerank_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=0, k=30, shortlist=20, **PQ_KW
            )

    def test_rerank_rejects_missing_query_id(self, spark, emb):
        import pytest as _pytest

        from ml_hadoop_experiment_spark.operators.ivf_fixture import (
            FROZEN_CENTROIDS_8X64,
        )
        from ml_hadoop_experiment_spark.operators.pq_index import (
            ivf_pq_rerank_topk,
        )

        with _pytest.raises(ValueError, match="expected 1 row, got 0"):
            ivf_pq_rerank_topk(
                emb, FROZEN_CENTROIDS_8X64, "vec_id", "embedding",
                query_id=10**9, k=5, shortlist=20, **PQ_KW
            )
