from ml_hadoop_experiment_spark.operators.sampling import (
    WEIGHT_COLUMN_NAME,
    add_deterministic_sampling_col,
    add_random_sampling_col,
    assign_split,
    get_filter_sampling_ratio,
    cap_per_key,
    sample_stratified_by,
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
from ml_hadoop_experiment_spark.operators.dedup import (
    NearDupCorpusIndex,
    build_corpus_index,
    dedup_exact,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    near_dup_against,
    near_dup_against_index,
    simhash,
    simhash_near_dup_pairs,
    tokens_frame,
)
from ml_hadoop_experiment_spark.operators.sketches import (
    kmv_distinct,
    kmv_distinct_sql,
)
from ml_hadoop_experiment_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    ivf_assign_fixed,
    ivf_index,
    ivf_topk,
    ivf_topk_fixed,
    lsh_bucketed,
)
from ml_hadoop_experiment_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
    time_bucket,
)

__all__ = [
    "asof_join",
    "cosine_near_dup_pairs",
    "cosine_topk",
    "dedup_exact",
    "ivf_assign_fixed",
    "ivf_index",
    "ivf_topk",
    "ivf_topk_fixed",
    "jaccard_pairs",
    "lsh_bucketed",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "NearDupCorpusIndex",
    "build_corpus_index",
    "near_dup_against",
    "near_dup_against_index",
    "range_join",
    "sessionize",
    "simhash",
    "simhash_near_dup_pairs",
    "time_bucket",
    "tokens_frame",
    "kmv_distinct",
    "kmv_distinct_sql",
    "evaluate_bootstrap",
    "poisson_bootstrap_metrics",
    "with_inference_column_and_preprocessing",
    "WEIGHT_COLUMN_NAME",
    "add_random_sampling_col",
    "add_deterministic_sampling_col",
    "get_filter_sampling_ratio",
    "assign_split",
    "cap_per_key",
    "sample_stratified_by",
    "sample_with_predicate",
    "build_vocabulary",
    "vocabulary_dataframe",
    "write_vocab_files",
    "with_inference_column",
    "with_sklearn_inference_column",
]
