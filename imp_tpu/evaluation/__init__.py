from .survival_metrics import (
    concordance_index_censored,
    concordance_index_ipcw,
    censoring_survival_function,
    NoComparablePairError,
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
