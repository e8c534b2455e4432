"""Conversion goldens — ports the reference's sparse/dense fixtures
(tests/tensorflow/test_numpy_to_sparse_tensors.py:7-56,
tests/tensorflow/test_pandas_to_tensors.py:9-93) to the engine layer."""

import numpy as np
import pandas as pd
import pytest

from ml_hadoop_experiment_spark.schema import (
    FixedLenFeature,
    VarLenFeature,
    create_sparse_coo,
    make_dense_batch_fn,
    sparse_coo_frame,
)
from ml_hadoop_experiment_spark.sizing import get_eval_params


def test_sparse_coo_golden():
    """Reference golden: [["a","b"],["c","d"],None,["e"]] ->
    indices [[0,0],[0,1],[1,0],[1,1],[3,0]], values [a,b,c,d,e], shape [4,2]."""
    indices, values, shape = create_sparse_coo([["a", "b"], ["c", "d"], None, ["e"]], "string")
    assert indices.tolist() == [[0, 0], [0, 1], [1, 0], [1, 1], [3, 0]]
    assert values.tolist() == ["a", "b", "c", "d", "e"]
    assert shape.tolist() == [4, 2]


def test_sparse_coo_numeric():
    indices, values, shape = create_sparse_coo([[1, 2, 3], [], [4]], "int64")
    assert indices.tolist() == [[0, 0], [0, 1], [0, 2], [2, 0]]
    assert values.tolist() == [1, 2, 3, 4]
    assert values.dtype == np.int64
    assert shape.tolist() == [3, 3]


def test_sparse_coo_all_empty():
    """All-empty edge case (reference numpy_to_sparse_tensors.py:40-46)."""
    indices, values, shape = create_sparse_coo([[], []], "float32")
    assert indices.shape == (0, 2)
    assert values.shape == (0,)
    assert shape.tolist() == [2, 0]


def test_dense_fill_and_error():
    specs = {
        "f1": FixedLenFeature((), "float32", default_value=1.5),
        "f2": FixedLenFeature((), "int64"),
    }
    fn = make_dense_batch_fn(specs)
    out = fn(pd.DataFrame({"f1": [2.0, None], "f2": [1, 2]}))
    assert out["f1"].tolist() == [2.0, 1.5]
    assert out["f1"].dtype == np.float32
    assert out["f2"].dtype == np.int64

    with pytest.raises(ValueError, match="no default value"):
        make_dense_batch_fn({"f2": FixedLenFeature((), "int64")})(
            pd.DataFrame({"f2": [1.0, None]})
        )


def test_default_type_mismatch_rejected():
    with pytest.raises(ValueError, match="incompatible"):
        make_dense_batch_fn({"f": FixedLenFeature((), "int64", default_value="x")})(
            pd.DataFrame({"f": [1]})
        )


def test_varlen_triple():
    specs = {"v": VarLenFeature("int64")}
    out = make_dense_batch_fn(specs)(pd.DataFrame({"v": [[1, 2], None, [3]]}))
    assert out["v/shape"].tolist() == [3, 2]
    assert out["v/indices"].tolist() == [[0, 0], [0, 1], [2, 0]]
    assert out["v/values"].tolist() == [1, 2, 3]


def test_non_scalar_fixedlen_rejected():
    with pytest.raises(NotImplementedError):
        make_dense_batch_fn({"f": FixedLenFeature((2, 2), "int64")})


def test_sparse_coo_frame(spark):
    df = spark.createDataFrame(
        [(10, ["a", "b"]), (20, None), (30, ["c"])], "id bigint, arr array<string>"
    )
    out = sparse_coo_frame(df, "arr", row_id_col="id").collect()
    triples = sorted((r["row_id"], r["pos"], r["value"]) for r in out)
    assert triples == [(10, 0, "a"), (10, 1, "b"), (30, 0, "c")]


def test_eval_params_golden():
    """Reference goldens (tests/tensorflow/test_evaluator_conf_helper.py)."""
    cfg = get_eval_params(10, 2, 1000)
    assert cfg.save_checkpoints_steps == 1000
    assert cfg.evaluation_batch_size == 200
    assert cfg.steps == 1
    assert cfg.throttle_secs == 5
    # batch splitting when exceeding the cap
    cfg2 = get_eval_params(1, 1, 1_000_000, max_eval_batch_size=300_000)
    assert cfg2.steps == 4
    assert cfg2.evaluation_batch_size == 250_000
    with pytest.raises(ValueError):
        get_eval_params(0, 1, 100)
