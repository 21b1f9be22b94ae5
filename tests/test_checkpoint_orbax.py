"""Orbax checkpoint backend (TPU.CHECKPOINT_BACKEND=orbax): same
best/last/pointer contract as the default flax-msgpack backend (reference
``medmm/utils/torchtools.py:27-157``), with format auto-detection on read
so mixed-backend output dirs resume fine."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from imp_tpu.utils.checkpoint import (
    best_checkpoint_path,
    load_checkpoint,
    resume_from_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from imp_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("orbaxdata"))
    synthetic.materialize(
        root, num_slides=24, bag_min=24, bag_max=48, feat_dim=32,
        num_genes=120, group_size=15, seed=0,
    )
    return root


def _state(seed=0, epoch=3):
    rng = np.random.default_rng(seed)
    params = {
        "params": {
            "dense": {
                "kernel": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
                "bias": jnp.zeros((4,), jnp.float32),
            }
        }
    }
    tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(1e-3),
    )
    return {
        "params": params,
        "opt_state": tx.init(params),
        "epoch": epoch,
        "val_result": 0.5,
    }


def _assert_tree_equal(got, want):
    for g, w in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_orbax_round_trip_and_resume(tmp_path):
    d = str(tmp_path / "model")
    state = _state(epoch=3)
    fpath = save_checkpoint(state, d, 3, backend="orbax")
    assert osp.isdir(fpath)  # orbax checkpoints are directories
    assert osp.exists(osp.join(d, "checkpoint"))

    target = _state(seed=1, epoch=0)
    got = load_checkpoint(fpath, target)
    _assert_tree_equal(got, state)

    resumed, epoch = resume_from_checkpoint(d, _state(seed=2, epoch=0))
    assert epoch == 3
    _assert_tree_equal(resumed, state)


def test_orbax_best_checkpoint(tmp_path):
    d = str(tmp_path / "model")
    state = _state(epoch=2)
    save_checkpoint(state, d, 2, is_best=True, backend="orbax")
    best = best_checkpoint_path(d)
    assert best is not None and osp.isdir(best)
    _assert_tree_equal(load_checkpoint(best, _state(seed=3)), state)
    # a later improvement replaces the existing best atomically
    state2 = _state(seed=8, epoch=5)
    save_checkpoint(state2, d, 5, is_best=True, backend="orbax")
    _assert_tree_equal(load_checkpoint(best, _state(seed=9)), state2)
    assert not osp.exists(best + ".tmp")


def test_mixed_backend_resume(tmp_path):
    """An msgpack run followed by an orbax save (or vice versa) resumes
    from whatever the pointer names — the reader auto-detects per file."""
    d = str(tmp_path / "model")
    s1, s2 = _state(seed=4, epoch=1), _state(seed=5, epoch=2)
    save_checkpoint(s1, d, 1, backend="msgpack")
    save_checkpoint(s2, d, 2, backend="orbax")
    resumed, epoch = resume_from_checkpoint(d, _state(seed=6, epoch=0))
    assert epoch == 2
    _assert_tree_equal(resumed, s2)
    # older msgpack file still loads directly
    _assert_tree_equal(
        load_checkpoint(osp.join(d, "model.ckpt-1"), _state(seed=7)), s1
    )


def test_trainer_end_to_end_orbax(synth_root, tmp_path):
    """ABMIL trains, checkpoints via orbax, and a fresh trainer resumes at
    the final epoch (mirror of test_abmil_resume on the msgpack path)."""
    from tests.test_train_e2e import _cfg
    from imp_tpu.engine import build_trainer

    cfg = _cfg(synth_root, tmp_path, "ABMIL", task="Survival", epochs=2)
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert result is not None and np.isfinite(result)
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "model", "checkpoint"))
    assert osp.isdir(osp.join(cfg.OUTPUT_DIR, "model", "model-best.ckpt"))

    trainer2 = build_trainer(cfg.clone())
    trainer2.train()
    assert trainer2.start_epoch == 2
