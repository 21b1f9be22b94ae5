"""Smoke tests: each fusion/MIL baseline trainer runs one epoch end-to-end
and produces finite metrics (the reference ships these as 11 separate
engines; SURVEY.md §2.5)."""

import numpy as np
import pytest

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fusiondata"))
    synthetic.materialize(
        root, num_slides=18, bag_min=16, bag_max=32, feat_dim=32,
        num_genes=1000, group_size=30, seed=0,
    )
    return root


def _cfg(synth_root, tmp_path, trainer, task="Survival"):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML" if task == "Survival" else "TCGA_Glioma_G"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 36
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = task
    cfg.TASK.LOSS = "nllsurvloss" if task == "Survival" else "celoss"
    cfg.TEST.EVALUATOR = "Survival" if task == "Survival" else "Classification"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 3
    cfg.DATALOADER.TEST.BATCH_SIZE = 3
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAIN.PRINT_FREQ = 100
    cfg.TRAINER.NAME = trainer
    cfg.TPU.PREFETCH = 0
    return cfg


@pytest.mark.parametrize(
    "trainer", ["MCAT", "CMTA", "Porpoise", "ConCAT", "ADD", "HFB", "TransMIL"]
)
def test_fusion_trainer_one_epoch(synth_root, tmp_path, trainer):
    cfg = _cfg(synth_root, tmp_path, trainer)
    t = build_trainer(cfg)
    result = t.train()
    assert result is not None and np.isfinite(result)


def test_mcat_uses_grad_accum(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "MCAT")
    t = build_trainer(cfg)
    assert t.cfg.OPTIM.GRAD_ACCUM == 32
