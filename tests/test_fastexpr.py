"""Bit-equality of functions/fastexpr SQL-text fragments against the
Column-API expressions they replaced (round-13 optimization: literal-heavy
expressions built as ONE F.expr parse instead of thousands of py4j calls).

Each reference below replicates the PRE-round-13 Column-API construction
verbatim, so any semantic drift in the SQL text (literal typing, fold
order, tie-breaks, null contracts) fails here with exact values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.functions import fastexpr as FX

CENTROIDS = [
    [0.1, -1.5, 3.0000000000000004, 2.5],
    [1e-9, 0.0, -0.0, 1.25],
    [-2.0, 7.5, 0.3333333333333333, 1e20],
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [0.25, -1.5, 3.125, 0.1]),
            (2, [1e-9, 2.0, -0.0, 7.75]),
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "id long, v array<float>",
    )


def _sqdist_ref(vec, coeffs):
    # verbatim pre-r13 similarity.squared_distance_expr
    cent = F.array(*[F.lit(float(c)) for c in coeffs])
    return F.aggregate(
        F.zip_with(
            vec, cent,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_ref(vec, centroids):
    # verbatim pre-r13 clustering.kmeans_assign_expr
    ranked = F.array(
        *[
            F.struct(_sqdist_ref(vec, cent).alias("d"), F.lit(i).alias("c"))
            for i, cent in enumerate(centroids)
        ]
    )
    return F.array_min(ranked)["c"]


def _assert_cols_equal(df, ref_col, sql_frag):
    out = df.select(ref_col.alias("ref"), F.expr(sql_frag).alias("new"))
    assert [str(f.dataType) for f in out.schema] == [
        str(out.schema[0].dataType)
    ] * 2, f"dtype mismatch: {out.schema}"
    for row in out.collect():
        # repr-compare so that float bit patterns (incl. -0.0) must match
        assert repr(row["ref"]) == repr(row["new"]), (
            f"{sql_frag[:80]}...: {row['ref']!r} != {row['new']!r}"
        )


def test_sqdist_frag(vec_df):
    for cent in CENTROIDS:
        _assert_cols_equal(
            vec_df, _sqdist_ref(F.col("v"), cent), FX.sqdist_frag("v", cent)
        )


def test_argmin_frag(vec_df):
    _assert_cols_equal(
        vec_df,
        _assign_ref(F.col("v"), CENTROIDS),
        FX.argmin_frag("v", CENTROIDS),
    )


def test_argmin_frag_over_slice(vec_df):
    halves = [c[:2] for c in CENTROIDS]
    _assert_cols_equal(
        vec_df,
        _assign_ref(F.slice(F.col("v"), 1, 2), halves),
        FX.argmin_frag(FX.slice_frag("v", 1, 2), halves),
    )


def test_dot_norm_cosine_frags(vec_df):
    q = [0.5, -2.25, 1e-3, 4.0]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    qsql = FX.double_array(q)
    dot_ref = F.aggregate(
        F.zip_with(F.col("v"), qcol, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    _assert_cols_equal(vec_df, dot_ref, FX.dot_frag("v", qsql))

    norm_ref = F.sqrt(
        F.aggregate(
            F.col("v"), F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    _assert_cols_equal(vec_df, norm_ref, FX.norm_frag("v"))

    # null contract: id=3 is the zero vector -> NULL cosine on both sides
    denom = norm_ref * F.sqrt(
        F.aggregate(
            qcol, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    cos_ref = F.when(denom != 0.0, dot_ref / denom)
    _assert_cols_equal(vec_df, cos_ref, FX.cosine_frag("v", qsql))


def test_bigint_array_dot(vec_df):
    code = [1, -127, 55, 0]
    ref = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.array(*[F.lit(int(c)).cast("long") for c in code]),
            lambda x, y: x.cast("long") * y,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    frag = (
        f"aggregate(zip_with(v, {FX.bigint_array(code)}, "
        "(x, y) -> CAST(x AS BIGINT) * y), CAST(0 AS BIGINT), "
        "(acc, x) -> acc + x)"
    )
    _assert_cols_equal(vec_df, ref, frag)


def test_dlit_round_trips(spark):
    vals = [0.0, -0.0, 5e-324, 1.7976931348623157e308, 0.1, 1 / 3, -2.5e-10]
    row = spark.range(1).select(
        *[F.expr(FX.dlit(v)).alias(f"c{i}") for i, v in enumerate(vals)]
    ).collect()[0]
    for i, v in enumerate(vals):
        got = row[f"c{i}"]
        assert repr(got) == repr(v), f"{v!r} -> {got!r}"
    with pytest.raises(ValueError):
        FX.dlit(float("inf"))
    with pytest.raises(ValueError):
        FX.dlit(float("nan"))


def test_sql_of_column_and_slice(vec_df):
    assert FX.sql_of("v") == "v"
    _assert_cols_equal(
        vec_df,
        _sqdist_ref(F.slice(F.col("v"), 1, 2), CENTROIDS[0][:2]),
        FX.sqdist_frag(FX.sql_of(F.slice(F.col("v"), 1, 2)), CENTROIDS[0][:2]),
    )
