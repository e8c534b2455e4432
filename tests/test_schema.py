"""Schema-layer truth table — ports the reference's exhaustive compat
assertions (tests/tensorflow/test_dataframe_to_tf_helper.py:11-114) onto the
TF-free FeatureSpec layer."""

import pytest
from pyspark.sql import types as T

from ml_hadoop_experiment_spark.schema import (
    FixedLenFeature,
    VarLenFeature,
    can_convert,
    exact_data_type_for_spec,
    exact_structfield_for_spec,
    is_dataframe_compatible_with_specs,
    is_datatype_compatible_with_spec,
    is_structfield_compatible_with_spec,
)


# --- widening truth table (reference :11-70) ------------------------------
@pytest.mark.parametrize(
    "spark_type,dtype,expected",
    [
        (T.IntegerType(), "int32", True),
        (T.IntegerType(), "int64", True),
        (T.LongType(), "int64", True),
        (T.LongType(), "int32", False),
        (T.FloatType(), "float32", True),
        (T.FloatType(), "float64", True),
        (T.DoubleType(), "float64", True),
        (T.DoubleType(), "float32", False),
        (T.StringType(), "string", True),
        (T.StringType(), "int64", False),
        (T.IntegerType(), "float32", False),
        (T.FloatType(), "int32", False),
    ],
)
def test_widening_table(spark_type, dtype, expected):
    assert can_convert(spark_type, dtype) is expected


def test_exact_types():
    assert exact_data_type_for_spec(FixedLenFeature((), "int32")) == T.IntegerType()
    assert exact_data_type_for_spec(FixedLenFeature((1,), "float32")) == T.ArrayType(
        T.FloatType(), False
    )
    assert exact_data_type_for_spec(FixedLenFeature((2, 3), "int64")) == T.ArrayType(
        T.ArrayType(T.LongType(), False), False
    )
    assert exact_data_type_for_spec(VarLenFeature("string")) == T.ArrayType(
        T.StringType(), False
    )


def test_rank_matching():
    spec = FixedLenFeature((1,), "float32")
    assert is_datatype_compatible_with_spec(spec, T.ArrayType(T.FloatType()))
    assert not is_datatype_compatible_with_spec(spec, T.FloatType())
    # rank-2 spec accepts flat rank-1 arrays (reference :84 and tests :50-58)
    spec2 = FixedLenFeature((2, 2), "int64")
    assert is_datatype_compatible_with_spec(spec2, T.ArrayType(T.LongType()))
    assert is_datatype_compatible_with_spec(
        spec2, T.ArrayType(T.ArrayType(T.LongType()))
    )
    assert not is_datatype_compatible_with_spec(spec2, T.LongType())


def test_varlen_accepts_scalar_and_array():
    spec = VarLenFeature("int64")
    assert is_datatype_compatible_with_spec(spec, T.LongType())
    assert is_datatype_compatible_with_spec(spec, T.ArrayType(T.LongType()))
    assert is_datatype_compatible_with_spec(spec, T.IntegerType())  # widening
    assert not is_datatype_compatible_with_spec(spec, T.StringType())


def test_nullability_requires_default():
    spec_no_default = FixedLenFeature((), "float32")
    spec_with_default = FixedLenFeature((), "float32", default_value=0.0)
    nullable = T.StructField("f", T.FloatType(), True)
    non_null = T.StructField("f", T.FloatType(), False)
    assert not is_structfield_compatible_with_spec(nullable, "f", spec_no_default)
    assert is_structfield_compatible_with_spec(nullable, "f", spec_with_default)
    assert is_structfield_compatible_with_spec(non_null, "f", spec_no_default)


def test_exact_structfield_nullability():
    assert exact_structfield_for_spec("f", FixedLenFeature((), "int64")).nullable is False
    assert (
        exact_structfield_for_spec("f", FixedLenFeature((), "int64", 0)).nullable is True
    )


def test_name_mismatch():
    sf = T.StructField("other", T.FloatType(), False)
    assert not is_structfield_compatible_with_spec(sf, "f", FixedLenFeature((), "float32"))


def test_dataframe_conjunction(spark):
    df = spark.createDataFrame([(1, 2.0)], "a int, b double")
    # createDataFrame columns are nullable -> specs need defaults
    assert is_dataframe_compatible_with_specs(
        df, {"a": FixedLenFeature((), "int64", 0), "b": FixedLenFeature((), "float64", 0.0)}
    )
    # nullable column without default is rejected (reference :126-133)
    assert not is_dataframe_compatible_with_specs(df, {"a": FixedLenFeature((), "int64")})
    assert not is_dataframe_compatible_with_specs(
        df, {"a": FixedLenFeature((), "int64", 0), "missing": VarLenFeature("int64")}
    )


def test_bad_dtype_rejected():
    with pytest.raises(ValueError):
        FixedLenFeature((), "int16")
    with pytest.raises(ValueError):
        VarLenFeature("bool")
