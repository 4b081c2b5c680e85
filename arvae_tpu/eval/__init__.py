from arvae_tpu.eval.metrics import (
    EVAL_METRIC_DICT,
    compute_interpretability_metric,
    compute_mig,
    compute_modularity,
    compute_correlation_score,
    compute_sap_score,
    normalize_data,
)

__all__ = [
    "EVAL_METRIC_DICT",
    "compute_interpretability_metric",
    "compute_mig",
    "compute_modularity",
    "compute_correlation_score",
    "compute_sap_score",
    "normalize_data",
]
