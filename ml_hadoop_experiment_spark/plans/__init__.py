from ml_hadoop_experiment_spark.plans.optimize import (
    executed_plan_str,
    has_pushed_filters,
    salted_join,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan_str",
    "has_pushed_filters",
    "salted_join",
    "wholestage_codegen_spans",
]
