"""Property-based tests (hypothesis) for the pure-Python kernels: the
TFRecord wire codec, sparse COO conversion, and portable hashes. Stronger
than the reference's example-based strategy (SURVEY.md §5: no
property-based testing there) — these run thousands of generated cases
without a Spark session."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ml_hadoop_experiment_spark.schema.conversion import create_sparse_coo
from ml_hadoop_experiment_spark.schema.feature_spec import (
    FixedLenFeature,
    VarLenFeature,
)
from ml_hadoop_experiment_spark.sources.tfrecords import (
    parse_example_bytes,
    to_example_bytes,
)

# TFRecord wire floats are 32-bit: roundtrip through float32
f32 = st.floats(allow_nan=False, allow_infinity=False, width=32)
i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# protobuf strings: any unicode; the codec stores utf-8 bytes
text = st.text(max_size=50)


@settings(max_examples=200)
@given(a=i64, b=f32, s=text)
def test_example_roundtrip_scalars(a: int, b: float, s: str):
    specs = {
        "a": FixedLenFeature([], "int64", default_value=0),
        "b": FixedLenFeature([], "float32", default_value=0.0),
        "s": FixedLenFeature([], "string", default_value=""),
    }
    out = parse_example_bytes(to_example_bytes({"a": a, "b": b, "s": s}, specs), specs)
    assert out["a"] == a
    assert out["s"] == s
    assert out["b"] == np.float32(b) or (math.isnan(out["b"]) and math.isnan(b))


@settings(max_examples=200)
@given(values=st.lists(i64, max_size=20))
def test_example_roundtrip_varlen(values):
    specs = {"v": VarLenFeature("int64")}
    out = parse_example_bytes(to_example_bytes({"v": values}, specs), specs)
    assert list(out["v"]) == values


@settings(max_examples=200)
@given(v=st.one_of(st.none(), i64))
def test_example_null_uses_default(v):
    specs = {"x": FixedLenFeature([], "int64", default_value=7)}
    out = parse_example_bytes(to_example_bytes({"x": v}, specs), specs)
    assert out["x"] == (7 if v is None else v)


@settings(max_examples=200)
@given(
    rows=st.lists(
        st.one_of(st.none(), st.lists(f32, max_size=8)), min_size=1, max_size=12
    )
)
def test_sparse_coo_invariants(rows):
    indices, values, shape = create_sparse_coo(rows, "float32")
    lengths = [0 if r is None else len(r) for r in rows]
    # shape is (n_rows, max_len); one value per non-empty cell
    assert shape.tolist() == [len(rows), max(lengths) if rows else 0]
    assert len(values) == sum(lengths)
    assert indices.shape == (sum(lengths), 2)
    if len(indices):
        # row ids are sorted, positions restart at 0 per row and are dense
        assert (np.diff(indices[:, 0]) >= 0).all()
        for row_id, length in enumerate(lengths):
            row_positions = indices[indices[:, 0] == row_id, 1]
            assert row_positions.tolist() == list(range(length))
        # values concatenate rows in order
        flat = [np.float32(x) for r in rows if r for x in r]
        assert values.tolist() == flat


@settings(max_examples=500)
@given(key=st.integers(min_value=0, max_value=2**62), salt=st.integers(0, 1000))
def test_portable_unit_hash_range(key, salt):
    """The python-side replica of the portable hash stays in [0,1) — the
    arithmetic Spark and DuckDB evaluate."""
    from ml_hadoop_experiment_spark.functions.hashing import (
        _KNUTH,
        _OFFSET,
        _TWO32,
        PORTABLE_HASH_MOD,
    )

    h = ((key % PORTABLE_HASH_MOD) * _KNUTH + _OFFSET + salt) % _TWO32
    u = h / _TWO32
    assert 0.0 <= u < 1.0


@settings(max_examples=500)
@given(
    ns=st.integers(min_value=0, max_value=4 * 10**18),
    width_s=st.integers(min_value=1, max_value=10**6),
)
def test_time_bucket_scale_invariance(ns: int, width_s: int):
    """The round-3 temporal claim: bucket ids computed from epoch-micros
    equal those from epoch-nanos for the same instant and width — so a
    fixture wire-type change can never shift a rollup bucket. (floor
    division by width*scale; µs = ns // 1000 exact for parquet-µs data.)"""
    us = ns // 1000
    # a parquet timestamp[us] instant has ns = us * 1000 exactly
    ns_exact = us * 1000
    assert us // (width_s * 1_000_000) == ns_exact // (width_s * 1_000_000_000)


@settings(max_examples=300)
@given(
    fp=st.integers(min_value=0, max_value=2**32 - 1),
    flips=st.lists(st.integers(0, 31), min_size=0, max_size=3),
    max_hamming=st.integers(1, 4),
)
def test_simhash_pigeonhole_blocking(fp: int, flips, max_hamming: int):
    """Any pair within `max_hamming` bit flips shares at least one of the
    max_hamming+1 disjoint blocks EXACTLY — the recall guarantee of the
    round-4 blocking fix, checked over generated fingerprints with flips
    deliberately allowed to land in the same or different blocks."""
    from ml_hadoop_experiment_spark.operators.dedup import simhash_block_bounds

    other = fp
    for b in set(flips[:max_hamming]):
        other ^= 1 << b
    bounds = simhash_block_bounds(32, max_hamming)
    assert len(bounds) == max_hamming + 1
    assert sum(w for _, w in bounds) == 32
    shares = any(
        (fp >> s) & ((1 << w) - 1) == (other >> s) & ((1 << w) - 1)
        for s, w in bounds
    )
    assert shares


@settings(max_examples=300)
@given(
    a=st.dictionaries(st.integers(0, 20), st.integers(-1000, 1000), max_size=12),
    q=st.dictionaries(st.integers(0, 20), st.integers(-1000, 1000), max_size=12),
)
def test_sparse_l1_decomposition_identity(a: dict, q: dict):
    """The identity series_l1_topk relies on (operators/timeseries.py):
    brute-force L1 over the union of buckets equals
    Σ_a-buckets |a - q̃|  +  (Σ|q| - Σ_matched |q|), exactly."""
    brute = sum(
        abs(a.get(b, 0) - q.get(b, 0)) for b in set(a) | set(q)
    )
    d_a = sum(abs(v - q.get(b, 0)) for b, v in a.items())
    matched_q = sum(abs(qv) for b, qv in q.items() if b in a)
    q_l1 = sum(abs(v) for v in q.values())
    assert d_a + q_l1 - matched_q == brute
