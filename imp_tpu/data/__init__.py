from .datum import Datum, DatasetBase, get_event_and_censorship
from .datasets import DATASET_REGISTRY, build_dataset, TCGAGlioma, TASK_SPECS
from .manager import (
    DataManager,
    SlideDataset,
    EpochLoader,
    collate,
    load_gene_group_indexes,
)
from . import external, labeling, synthetic

__all__ = [
    "Datum",
    "DatasetBase",
    "get_event_and_censorship",
    "DATASET_REGISTRY",
    "build_dataset",
    "TCGAGlioma",
    "TASK_SPECS",
    "DataManager",
    "SlideDataset",
    "EpochLoader",
    "collate",
    "load_gene_group_indexes",
    "external",
    "labeling",
    "synthetic",
]
