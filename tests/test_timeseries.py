"""Series similarity search tests: exact sparse L1 decomposition."""

import pytest

from ml_hadoop_experiment_spark.operators.timeseries import series_l1_topk


@pytest.fixture(scope="module")
def series(spark):
    # key "q": the query itself; "near": differs by 1.0 in one bucket;
    # "sparse": one shared bucket; "far": disjoint buckets entirely
    rows = [
        ("q", 0, 10.0), ("q", 1, 20.0), ("q", 2, 30.0),
        ("near", 0, 10.0), ("near", 1, 21.0), ("near", 2, 30.0),
        ("sparse", 1, 20.0),
        ("far", 7, 5.0), ("far", 8, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, bucket long, v double")


def test_sparse_l1_distances(spark, series):
    q = series.where("k = 'q'").select("bucket", "v")
    out = {r["k"]: r for r in series_l1_topk(series, ["k"], "bucket", "v", q, k=10).collect()}
    assert out["q"]["distance"] == 0.0 and out["q"]["n_common"] == 3
    assert out["near"]["distance"] == 1.0
    # sparse: matched bucket contributes 0, missing q-buckets |10|+|30|
    assert out["sparse"]["distance"] == 40.0 and out["sparse"]["n_common"] == 1
    # far: no overlap -> own mass + full query mass
    assert out["far"]["distance"] == 10.0 + 60.0 and out["far"]["n_common"] == 0


def test_topk_bounded_and_ordered(spark, series):
    q = series.where("k = 'q'").select("bucket", "v")
    out = series_l1_topk(series, ["k"], "bucket", "v", q, k=2).collect()
    assert [r["k"] for r in out] == ["q", "near"]
