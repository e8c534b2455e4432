from ml_hadoop_experiment_spark.operators.sampling import (
    WEIGHT_COLUMN_NAME,
    add_deterministic_sampling_col,
    add_random_sampling_col,
    get_filter_sampling_ratio,
    sample_with_predicate,
)
from ml_hadoop_experiment_spark.operators.vocabulary import (
    build_vocabulary,
    vocabulary_dataframe,
    write_vocab_files,
)
from ml_hadoop_experiment_spark.operators.inference import (
    with_inference_column,
    with_inference_column_and_preprocessing,
    with_sklearn_inference_column,
)
from ml_hadoop_experiment_spark.operators.bootstrap import (
    evaluate_bootstrap,
    poisson_bootstrap_metrics,
)

__all__ = [
    "evaluate_bootstrap",
    "poisson_bootstrap_metrics",
    "with_inference_column_and_preprocessing",
    "WEIGHT_COLUMN_NAME",
    "add_random_sampling_col",
    "add_deterministic_sampling_col",
    "get_filter_sampling_ratio",
    "sample_with_predicate",
    "build_vocabulary",
    "vocabulary_dataframe",
    "write_vocab_files",
    "with_inference_column",
    "with_sklearn_inference_column",
]
