"""CLIPOMIC trainer: frozen pretrained CLIP text tower + trainable
prompt/pool/classifier partition (reference ``medmm/engine/clipomic.py``:
requires_grad_(False) on every ``omic_encoder`` param, ref ``:124-126``;
CLIP weights loaded from a checkpoint, ref ``:18-33``)."""

import numpy as np
import pytest
import torch

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer

WIDTH, HEADS, LAYERS, VOCAB, CONTEXT = 64, 4, 2, 128, 16


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clipomicdata"))
    synthetic.materialize(
        root, num_slides=16, bag_min=16, bag_max=32, feat_dim=32,
        num_genes=200, group_size=25, seed=0,
    )
    return root


def _cfg(synth_root, tmp_path):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_G"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 32
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Grading"
    cfg.TASK.LOSS = "celoss"
    cfg.TEST.EVALUATOR = "Classification"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.OPTIM.LR = 1e-3
    cfg.TRAINER.NAME = "CLIPOMIC"
    cfg.MODEL.NAME = "clipomic"
    cfg.MODEL.BACKBONE.TEXT_WIDTH = WIDTH
    cfg.MODEL.BACKBONE.TEXT_HEADS = HEADS
    cfg.MODEL.BACKBONE.TEXT_LAYERS = LAYERS
    cfg.MODEL.BACKBONE.TEXT_VOCAB = VOCAB
    cfg.MODEL.BACKBONE.TEXT_CONTEXT = CONTEXT
    cfg.TPU.PREFETCH = 0
    return cfg


def _fake_clip_text_state(seed=0):
    """A tiny torch CLIP-text state_dict matching the TEXT_* test config."""
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    state = {
        "token_embedding.weight": r(VOCAB, WIDTH),
        "positional_embedding": r(CONTEXT, WIDTH),
        "text_projection": r(WIDTH, WIDTH),
        "ln_final.weight": torch.ones(WIDTH),
        "ln_final.bias": torch.zeros(WIDTH),
    }
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        state.update(
            {
                p + "ln_1.weight": torch.ones(WIDTH),
                p + "ln_1.bias": torch.zeros(WIDTH),
                p + "ln_2.weight": torch.ones(WIDTH),
                p + "ln_2.bias": torch.zeros(WIDTH),
                p + "attn.in_proj_weight": r(3 * WIDTH, WIDTH),
                p + "attn.in_proj_bias": torch.zeros(3 * WIDTH),
                p + "attn.out_proj.weight": r(WIDTH, WIDTH),
                p + "attn.out_proj.bias": torch.zeros(WIDTH),
                p + "mlp.c_fc.weight": r(4 * WIDTH, WIDTH),
                p + "mlp.c_fc.bias": torch.zeros(4 * WIDTH),
                p + "mlp.c_proj.weight": r(WIDTH, 4 * WIDTH),
                p + "mlp.c_proj.bias": torch.zeros(WIDTH),
            }
        )
    return state


def test_clipomic_pretrained_load_and_freeze(synth_root, tmp_path):
    import jax

    state = _fake_clip_text_state()
    ckpt = str(tmp_path / "clip_text.pt")
    torch.save(state, ckpt)

    cfg = _cfg(synth_root, tmp_path)
    cfg.MODEL.BACKBONE.CLIP_CHECKPOINT = ckpt
    trainer = build_trainer(cfg)

    bb = jax.device_get(trainer.params)["params"]["genomic_backbone"]
    # pretrained weights actually landed
    np.testing.assert_allclose(
        bb["token_embedding"],
        state["token_embedding.weight"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        bb["resblocks_1"]["attn"]["in_proj_weight"],
        state["transformer.resblocks.1.attn.in_proj_weight"].numpy().T,
        rtol=1e-6,
    )

    before = jax.device_get(trainer.params)["params"]
    result = trainer.train()
    assert result is not None and np.isfinite(result)
    after = jax.device_get(trainer.params)["params"]

    frozen_names = (
        "token_embedding", "positional_embedding", "text_projection",
        "ln_final", "resblocks_0", "resblocks_1",
    )
    for name in frozen_names:
        np.testing.assert_array_equal(
            np.concatenate(
                [x.ravel() for x in jax.tree_util.tree_leaves(before["genomic_backbone"][name])]
            ),
            np.concatenate(
                [x.ravel() for x in jax.tree_util.tree_leaves(after["genomic_backbone"][name])]
            ),
            err_msg=f"frozen param {name} changed",
        )
    # the trainable partition moved
    for name in ("omic_fc", "fc", "attention_net", "rho"):
        b = np.concatenate(
            [x.ravel() for x in jax.tree_util.tree_leaves(before["genomic_backbone"][name])]
        )
        a = np.concatenate(
            [x.ravel() for x in jax.tree_util.tree_leaves(after["genomic_backbone"][name])]
        )
        assert not np.allclose(a, b), f"trainable param {name} did not move"
    assert not np.allclose(
        np.asarray(after["classifier"]["kernel"]),
        np.asarray(before["classifier"]["kernel"]),
    )


def test_clipomic_random_init_trains(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path)
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert result is not None and np.isfinite(result)
