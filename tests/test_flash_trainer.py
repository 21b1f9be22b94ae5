"""TPU.ATTENTION=flash config path through a real trainer, plus
Nystromformer and checkpoint-frequency coverage."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer
from imp_tpu.ops import Nystromformer
from imp_tpu.ops.attention import set_default_attention_impl


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("flashdata"))
    synthetic.materialize(root, num_slides=12, bag_min=16, bag_max=32, feat_dim=32,
                          num_genes=120, group_size=15, seed=0)
    return root


@pytest.fixture(autouse=True)
def _restore_attention_impl():
    yield
    set_default_attention_impl("nystrom")


def test_transmil_with_flash_attention(synth_root, tmp_path):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_S"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 36
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TEST.EVALUATOR = "Survival"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 3
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAINER.NAME = "TransMIL"
    cfg.TPU.ATTENTION = "flash"
    cfg.TPU.PREFETCH = 0
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)


def test_nystromformer_runs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 64)), jnp.float32)
    mask = jnp.asarray(np.arange(40)[None, :] < np.array([[30], [40]]))
    mod = Nystromformer(dim=64, depth=2, dim_head=8, heads=8, num_landmarks=8)
    params = mod.init(jax.random.PRNGKey(0), x, mask=mask)
    y = mod.apply(params, x, mask=mask)
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_checkpoint_freq(synth_root, tmp_path):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_S"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 36
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TEST.NO_TEST = True
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 3
    cfg.OPTIM.MAX_EPOCH = 2
    cfg.TRAIN.CHECKPOINT_FREQ = 1  # checkpoint every epoch
    cfg.TRAINER.NAME = "ABMIL"
    cfg.TPU.PREFETCH = 0
    trainer = build_trainer(cfg)
    trainer.train()
    mdir = osp.join(cfg.OUTPUT_DIR, "model")
    assert osp.exists(osp.join(mdir, "model.ckpt-1"))
    assert osp.exists(osp.join(mdir, "model.ckpt-2"))
