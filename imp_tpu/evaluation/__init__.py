from .survival_metrics import (
    concordance_index_censored,
    concordance_index_ipcw,
    censoring_survival_function,
    NoComparablePairError,
)
from .accuracy import (
    compute_accuracy,
    compute_distance_matrix,
    euclidean_squared_distance,
    cosine_distance,
)
from .evaluators import (
    EVALUATOR_REGISTRY,
    build_evaluator,
    EvaluatorBase,
    Classification,
    Classification_UMEML,
    Survival,
    Survival_UMEML,
    auc_com,
)

__all__ = [
    "compute_accuracy",
    "compute_distance_matrix",
    "euclidean_squared_distance",
    "cosine_distance",
    "concordance_index_censored",
    "concordance_index_ipcw",
    "censoring_survival_function",
    "NoComparablePairError",
    "EVALUATOR_REGISTRY",
    "build_evaluator",
    "EvaluatorBase",
    "Classification",
    "Classification_UMEML",
    "Survival",
    "Survival_UMEML",
    "auc_com",
]
