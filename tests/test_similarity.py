"""Similarity-search tests: brute-force top-k, LSH buckets, near-dup pairs."""

import math

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    lsh_bucketed,
    plane_vectors,
)


def test_cosine_topk_golden(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = cosine_topk(df, [1.0, 0.0], k=3).collect()
    got = [(r["id"], r["score"]) for r in out]
    assert got[0] == (1, 1.0)
    assert got[1][0] == 3 and got[1][1] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert got[2] == (2, 0.0)


def test_topk_is_take_ordered(spark, embeddings):
    """orderBy+limit must plan as TakeOrderedAndProject, not a global sort."""
    q = embeddings.first()["embedding"]
    df = cosine_topk(embeddings, q, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lsh_bucket_range_and_determinism(spark, embeddings):
    b1 = {r["id"]: r["bucket"] for r in lsh_bucketed(embeddings, num_planes=4).collect()}
    b2 = {r["id"]: r["bucket"] for r in lsh_bucketed(embeddings, num_planes=4).collect()}
    assert b1 == b2
    assert all(0 <= v < 16 for v in b1.values())
    assert len(set(b1.values())) > 1  # actually spreads


def test_near_dup_pairs_finds_identical(spark):
    rows = [
        (1, [0.5, 0.5, 0.5]),
        (2, [0.5, 0.5, 0.5]),       # identical -> cosine 1
        (3, [0.51, 0.5, 0.5]),      # near
        (4, [-1.0, 0.2, 0.1]),      # far
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = cosine_near_dup_pairs(df, num_planes=2, dim=3, threshold=0.99)
    got = {(r["id_a"], r["id_b"]): r["score"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and (2, 3) in got
    assert not any(4 in k for k in got)


def test_plane_vectors_deterministic():
    a = plane_vectors(3, 8)
    b = plane_vectors(3, 8)
    assert a == b
    flat = [v for plane in a for v in plane]
    assert all(-0.5 <= v < 0.5 for v in flat)
    assert len(set(flat)) > 20  # not degenerate


def test_ivf_topk_recall_against_brute_force(spark):
    """IVF with full probe = exact; with partial probe, recall@10 vs the
    brute-force top-10 on real embeddings must stay high."""
    from ml_hadoop_experiment_spark.operators.similarity import ivf_index, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = emb.where(F.col("vec_id") == 0).head()["embedding"]

    exact = [r["id"] for r in cosine_topk(
        emb, query, id_col="vec_id", vec_col="embedding", k=10).collect()]

    assigned, centers = ivf_index(emb, num_centroids=4, seed=42)
    # full probe degenerates to exact brute force
    full = [r["id"] for r in ivf_topk(assigned, centers, query, k=10,
                                      nprobe=len(centers)).collect()]
    assert full == exact

    # partial probe: the query's own list is probed first, so the query
    # vector itself and most true neighbors are found
    approx = [r["id"] for r in ivf_topk(assigned, centers, query, k=10,
                                        nprobe=2).collect()]
    recall = len(set(approx) & set(exact)) / 10
    assert approx[0] == exact[0] == 0  # vec_id 0 most similar to itself
    assert recall >= 0.5, f"recall@10 {recall}"


def test_ivf_lists_partition_all_rows(spark):
    from ml_hadoop_experiment_spark.operators.similarity import ivf_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, centers = ivf_index(emb, num_centroids=4, seed=42)
    assert assigned.count() == emb.count()
    lists = {r["list_id"] for r in assigned.select("list_id").distinct().collect()}
    assert lists <= set(range(4)) and len(lists) > 1


def test_ivf_fixed_assignment_is_argmin_and_maponly(spark):
    """Frozen-centroid assignment: every row lands on its true nearest
    centroid (numpy cross-check), the plan has no exchange, and probe
    selection matches the same argsort."""
    import numpy as np

    from ml_hadoop_experiment_spark.operators.ivf_fixture import FROZEN_CENTROIDS_8X64
    from ml_hadoop_experiment_spark.operators.similarity import (
        ivf_assign_fixed,
        ivf_probes_fixed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = ivf_assign_fixed(emb, FROZEN_CENTROIDS_8X64)
    assert "Exchange" not in assigned._jdf.queryExecution().executedPlan().toString()

    cents = np.asarray(FROZEN_CENTROIDS_8X64)
    for r in assigned.collect():
        v = np.asarray(r["vec"], dtype=np.float64)
        want = int(((cents - v) ** 2).sum(axis=1).argmin())
        assert r["list_id"] == want, r["id"]

    q = emb.where(F.col("vec_id") == 0).head()["embedding"]
    probes = ivf_probes_fixed(FROZEN_CENTROIDS_8X64, q, nprobe=3)
    dists = ((cents - np.asarray(q, dtype=np.float64)) ** 2).sum(axis=1)
    assert probes == [int(i) for i in dists.argsort(kind="stable")[:3]]


def test_ivf_fixed_full_probe_equals_brute_force(spark):
    from ml_hadoop_experiment_spark.operators.ivf_fixture import FROZEN_CENTROIDS_8X64
    from ml_hadoop_experiment_spark.operators.similarity import ivf_topk_fixed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).head()["embedding"]
    exact = [r["id"] for r in cosine_topk(
        emb, q, id_col="vec_id", vec_col="embedding", k=10).collect()]
    full = [r["id"] for r in ivf_topk_fixed(
        emb, FROZEN_CENTROIDS_8X64, q, k=10, nprobe=8).collect()]
    assert full == exact


def test_embedding_centroids_golden(spark):
    from ml_hadoop_experiment_spark.operators.similarity import embedding_centroids

    rows = [
        (0, [1.0, 2.0]),
        (0, [3.0, 4.0]),
        (1, [10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r["label"]: (r["n"], r["centroid"])
           for r in embedding_centroids(df, "label", "embedding", dim=2).collect()}
    assert out[0] == (2, [2.0, 3.0])
    assert out[1] == (1, [10.0, 0.0])


def test_embedding_centroids_single_aggregation_no_explode(spark):
    from ml_hadoop_experiment_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame([(0, [1.0, 2.0])], "label int, embedding array<float>")
    plan = (
        embedding_centroids(df, "label", "embedding", dim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan  # no explode: per-position aggregates only
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cosine_topk_batch_matches_single_query(spark):
    from ml_hadoop_experiment_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
    )

    import random

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    batch = cosine_topk_batch(df, queries, k=4)
    got = {(r["qid"], r["rk"]): r["id"] for r in batch.collect()}
    for qid in range(3):
        qvec = rows[qid][1]
        single = cosine_topk(df, qvec, k=4).collect()
        for rk, r in enumerate(single, start=1):
            assert got[(qid, rk)] == r["id"], (qid, rk)

    with pytest.raises(ValueError, match="k must be positive"):
        cosine_topk_batch(df, queries, k=0)


def test_cosine_topk_batch_corpus_never_shuffles_before_scoring(spark):
    from ml_hadoop_experiment_spark.operators.similarity import cosine_topk_batch

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>")
    q = df.select(F.col("vec_id").alias("qid"), "embedding")
    plan = cosine_topk_batch(df, q, k=1)._jdf.queryExecution().executedPlan().toString()
    # queries broadcast; the only exchange is the per-qid top-k window
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
