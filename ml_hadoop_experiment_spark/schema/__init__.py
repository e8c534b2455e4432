from ml_hadoop_experiment_spark.schema.feature_spec import (
    FixedLenFeature,
    VarLenFeature,
    can_convert,
    exact_data_type_for_spec,
    exact_spark_type,
    exact_structfield_for_spec,
    is_dataframe_compatible_with_specs,
    is_datatype_compatible_with_spec,
    is_structfield_compatible_with_spec,
)
from ml_hadoop_experiment_spark.schema.conversion import (
    create_sparse_coo,
    make_dense_batch_fn,
    sparse_coo_frame,
)

__all__ = [
    "FixedLenFeature",
    "VarLenFeature",
    "can_convert",
    "exact_spark_type",
    "exact_data_type_for_spec",
    "exact_structfield_for_spec",
    "is_datatype_compatible_with_spec",
    "is_structfield_compatible_with_spec",
    "is_dataframe_compatible_with_specs",
    "create_sparse_coo",
    "make_dense_batch_fn",
    "sparse_coo_frame",
]
