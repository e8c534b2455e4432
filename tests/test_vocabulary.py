"""Vocabulary tests — mirrors reference tests/tensorflow/test_vocabulary.py:
distinct sets with thresholds, list columns, merged keys, empty-string drop."""

import os

import pytest

from ml_hadoop_experiment_spark.operators.vocabulary import (
    build_vocabulary,
    vocabulary_dataframe,
    write_vocab_files,
)


@pytest.fixture(scope="module")
def vocab_df(spark):
    rows = [
        (1, 10, None, ["a", "b"]),
        (1, 20, 7, ["a"]),
        (2, 10, 7, []),
        (1, 30, None, ["c"]),
    ]
    return spark.createDataFrame(
        rows, "feature1 int, feature2 int, feature3 int, my_feature array<string>"
    )


def test_simple_columns(vocab_df):
    vocab = build_vocabulary(vocab_df, ["feature1", "feature2"])
    assert sorted(vocab["feature1"]) == ["1", "2"]
    assert sorted(vocab["feature2"]) == ["10", "20", "30"]


def test_threshold(vocab_df):
    vocab = build_vocabulary(vocab_df, ["feature1", "feature2"], threshold=2)
    # threshold=2 keeps only values appearing >= 2 times ("1" x3, "10" x2)
    assert vocab["feature1"] == ["1"]
    assert vocab["feature2"] == ["10"]


def test_array_column_explodes(vocab_df):
    vocab = build_vocabulary(vocab_df, ["my_feature"])
    assert sorted(vocab["my_feature"]) == ["a", "b", "c"]


def test_merged_keys(vocab_df):
    """Many-to-one key merge (reference vocabulary.py:108-121 +
    tests/tensorflow/test_vocabulary.py:63-84)."""
    vocab = build_vocabulary(
        vocab_df, {"k1": ["feature1", "feature2"], "k2": ["feature2", "feature3"]}
    )
    assert sorted(vocab["k1"]) == ["1", "10", "2", "20", "30"]
    assert sorted(vocab["k2"]) == ["10", "20", "30", "7"]


def test_merged_counts_accumulate(spark):
    # value 7 appears once in each of two merged columns -> count 2 meets threshold
    df = spark.createDataFrame([(7, 7)], "a int, b int")
    vocab = build_vocabulary(df, {"k": ["a", "b"]}, threshold=2)
    assert vocab["k"] == ["7"]


def test_nulls_dropped(vocab_df):
    vocab = build_vocabulary(vocab_df, ["feature3"])
    assert sorted(vocab["feature3"]) == ["7"]


def test_max_rows_cap(vocab_df):
    with pytest.raises(ValueError):
        build_vocabulary(vocab_df, ["feature2"], max_rows=2)


def test_write_vocab_files(spark, tmp_path):
    df = spark.createDataFrame([("x",), ("",), ("y",), ("x",)], "c string")
    out = str(tmp_path / "voc")
    write_vocab_files(df, ["c"], out)
    key_dir = os.path.join(out, "key=c")
    values = set()
    for f in os.listdir(key_dir):
        if f.startswith("part-"):
            with open(os.path.join(key_dir, f)) as fh:
                values.update(line.strip() for line in fh if line.strip())
    assert values == {"x", "y"}  # empty string dropped


def test_vocabulary_dataframe_schema(vocab_df):
    vdf = vocabulary_dataframe(vocab_df, ["feature1"])
    assert [f.name for f in vdf.schema.fields] == ["key", "value", "count"]


def test_vocab_id_table_orders_by_frequency_then_value(spark):
    from ml_hadoop_experiment_spark.operators.vocabulary import vocab_id_table

    counts = spark.createDataFrame(
        [("the", 100), ("cat", 7), ("ant", 7), ("zoo", 50)],
        "value string, count long",
    )
    got = {r["value"]: r["token_id"] for r in vocab_id_table(counts).collect()}
    # frequency desc, ties by value asc
    assert got == {"the": 1, "zoo": 2, "ant": 3, "cat": 4}


def test_encode_tokens_to_ids_preserves_order_and_maps_oov(spark):
    from ml_hadoop_experiment_spark.operators.vocabulary import (
        encode_tokens_to_ids,
        vocab_id_table,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "unknownword the")],
        "doc_id int, text string",
    )
    vocab = vocab_id_table(
        spark.createDataFrame(
            [("the", 10), ("cat", 5), ("sat", 5), ("on", 5), ("mat", 5)],
            "value string, count long",
        )
    )
    out = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in encode_tokens_to_ids(docs, "doc_id", "text", vocab).collect()
    }
    # ids: the=1, then cat/mat/on/sat alphabetical at count 5 -> 2,3,4,5
    assert out[1] == ([1, 2, 5, 4, 1, 3], 6)
    assert out[2] == ([0, 1], 2)  # OOV -> 0, order preserved
