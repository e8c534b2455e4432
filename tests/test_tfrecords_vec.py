"""Vectorized TFRecord encoder: byte-identity with the per-row codec and
roundtrips through the Spark sink/source."""

import numpy as np
import pandas as pd
import pytest

from ml_hadoop_experiment_spark.schema.feature_spec import FixedLenFeature, VarLenFeature
from ml_hadoop_experiment_spark.sources.tfrecords import (
    make_example_encoder,
    parse_example_bytes,
    read_tfrecord_file,
)
from ml_hadoop_experiment_spark.sources.tfrecords_vec import (
    encode_framed_batch,
    frame_record,
    vectorized_supported,
)

SPECS = {
    "i": FixedLenFeature((), "int64", default_value=0),
    "j": FixedLenFeature((), "int32", default_value=0),
    "f": FixedLenFeature((), "float32", default_value=0.0),
    "d": FixedLenFeature((), "float64", default_value=0.0),
    "s": FixedLenFeature((), "string", default_value=""),
}


def _per_row_stream(pdf, specs):
    enc = make_example_encoder(specs)
    return b"".join(frame_record(enc(r)) for r in pdf.to_dict("records"))


def test_byte_identity_edge_values():
    pdf = pd.DataFrame(
        {
            "i": np.array(
                [0, 1, -1, 127, 128, 16383, 16384, 2**63 - 1, -(2**63), 300],
                dtype=np.int64,
            ),
            "j": np.array([0, -5, 2**31 - 1, -(2**31), 1, 2, 3, 4, 5, 6], dtype=np.int64),
            "f": np.array(
                [0.0, -0.0, 1.5, float("inf"), float("-inf"), 1e-38, 3.25, -7.5, 42.0, 0.1],
                dtype=np.float32,
            ),
            "d": np.arange(10, dtype=np.float64) * 1.25,
            "s": ["", "a", "bb", "x" * 126, "x" * 127, "x" * 128, "x" * 129,
                  "x" * 16384, "ünïcødé", "tab\tnl\n"],
        }
    )
    fast = encode_framed_batch(pdf, SPECS)
    assert fast == _per_row_stream(pdf, SPECS)


def test_byte_identity_random_bulk():
    rng = np.random.RandomState(7)
    n = 5000
    pdf = pd.DataFrame(
        {
            "i": rng.randint(-(2**62), 2**62, n).astype(np.int64),
            "j": rng.randint(-(2**31), 2**31, n).astype(np.int64),
            "f": rng.randn(n).astype(np.float32) * 1e6,
            "d": rng.randn(n) * 1e12,
            "s": ["w" * int(k) for k in rng.randint(0, 200, n)],
        }
    )
    assert encode_framed_batch(pdf, SPECS) == _per_row_stream(pdf, SPECS)


def test_fallback_conditions():
    # nulls -> per-row path owns default/omit semantics
    pdf = pd.DataFrame({"i": [1, None]})
    assert encode_framed_batch(pdf, {"i": FixedLenFeature((), "int64", default_value=0)}) is None
    # non-scalar / varlen specs unsupported
    assert not vectorized_supported({"v": VarLenFeature("int64")})
    assert not vectorized_supported({"a": FixedLenFeature((2,), "int64")})
    assert vectorized_supported(SPECS)
    # missing column -> fallback synthesizes defaults
    assert encode_framed_batch(pd.DataFrame({"i": [1]}), SPECS) is None
    # empty batch -> empty stream, not None
    empty = pd.DataFrame({c: [] for c in SPECS})
    assert encode_framed_batch(empty, SPECS) == b""


def test_framed_stream_parses_back(tmp_path):
    pdf = pd.DataFrame(
        {
            "i": np.array([5, -9], dtype=np.int64),
            "j": np.array([1, 2], dtype=np.int64),
            "f": np.array([1.5, -2.5], dtype=np.float32),
            "d": np.array([0.25, 0.5]),
            "s": ["hello", ""],
        }
    )
    path = str(tmp_path / "vec.tfrecord")
    with open(path, "wb") as f:
        f.write(encode_framed_batch(pdf, SPECS))
    rows = [
        parse_example_bytes(rec, SPECS) for rec in read_tfrecord_file(path, None)
    ]
    assert rows[0] == {"i": 5, "j": 1, "f": 1.5, "d": 0.25, "s": "hello"}
    assert rows[1]["i"] == -9 and rows[1]["s"] == ""


def test_spark_sink_uses_vectorized_path(spark, tmp_path):
    """End-to-end: the sink writes a scalar-spec frame through the
    vectorized encoder and the distributed source reads it back."""
    from ml_hadoop_experiment_spark.sources.tfrecords import (
        read_tfrecords,
        write_tfrecords,
    )

    specs = {
        "k": FixedLenFeature((), "int64", default_value=0),
        "p": FixedLenFeature((), "float32", default_value=0.0),
        "t": FixedLenFeature((), "string", default_value=""),
    }
    df = spark.range(500).selectExpr(
        "id as k", "cast(id as float) / 4 as p", "concat('row-', id) as t"
    )
    out = str(tmp_path / "sink")
    written = write_tfrecords(df, specs, out, num_files=4)
    assert sum(c for _, c in written) == 500
    back = read_tfrecords(spark, out, specs)
    got = {r["k"]: (r["p"], r["t"]) for r in back.collect()}
    assert len(got) == 500
    assert got[8] == (2.0, "row-8")


@pytest.mark.parametrize("comp", [None, "gzip"])
def test_sink_fallback_matches_vectorized_bytes(spark, tmp_path, comp):
    """A VarLen spec forces the per-row fallback; both paths must produce
    streams the reader decodes identically (framing compatibility)."""
    from ml_hadoop_experiment_spark.sources.tfrecords import (
        read_tfrecords,
        write_tfrecords,
    )

    specs = {
        "k": FixedLenFeature((), "int64", default_value=0),
        "v": VarLenFeature("int64"),
    }
    df = spark.range(50).selectExpr("id as k", "array(id, id + 1) as v")
    out = str(tmp_path / f"sink_{comp}")
    written = write_tfrecords(df, specs, out, num_files=2, compression=comp)
    assert sum(c for _, c in written) == 50
    back = read_tfrecords(spark, out, specs, compression=comp)
    got = {r["k"]: list(r["v"]) for r in back.collect()}
    assert got[10] == [10, 11]


def test_byte_identity_property():
    """Property: for ANY mix of scalar spec dtypes and values, the
    vectorized stream equals the per-row stream byte for byte."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    floats = st.floats(width=32, allow_nan=False)  # NaN batches fall back by design
    texts = st.text(max_size=300)

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(ints, ints, floats, texts), min_size=1, max_size=50
        )
    )
    def run(rows):
        pdf = pd.DataFrame(
            {
                "i": np.array([r[0] for r in rows], dtype=np.int64),
                "j": np.array([r[1] for r in rows], dtype=np.int64),
                "f": np.array([r[2] for r in rows], dtype=np.float32),
                "s": [r[3] for r in rows],
            }
        )
        specs = {
            "i": FixedLenFeature((), "int64", default_value=0),
            "j": FixedLenFeature((), "int32", default_value=0),
            "f": FixedLenFeature((), "float32", default_value=0.0),
            "s": FixedLenFeature((), "string", default_value=""),
        }
        assert encode_framed_batch(pdf, specs) == _per_row_stream(pdf, specs)

    run()
