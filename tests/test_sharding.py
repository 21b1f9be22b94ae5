"""Honest data-parallel sharding (SURVEY.md §2.8, DataParallel row).

The mesh layer must never silently degrade to replication: ragged batches
are wrap-padded by ``engine.trainer.device_batch`` so dim 0 always shards
over the data axis, and ``parallel.shard_batch`` hard-errors on anything
that cannot shard.  A 1-device vs 8-device train step must agree.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer
from imp_tpu.engine.trainer import device_batch, pad_ragged_dim0
from imp_tpu.parallel import make_mesh, shard_batch


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(("data",), (8,))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sharddata"))
    synthetic.materialize(
        root, num_slides=24, bag_min=24, bag_max=48, feat_dim=32,
        num_genes=120, group_size=15, seed=0,
    )
    return root


def test_shard_batch_raises_on_ragged(mesh8):
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch({"img": np.zeros((3, 4), np.float32)}, mesh8)


def test_pad_ragged_dim0_wraps():
    arrays = {"x": np.arange(3 * 2, dtype=np.float32).reshape(3, 2)}
    padded = pad_ragged_dim0(arrays, 8)
    assert padded["x"].shape == (8, 2)
    np.testing.assert_array_equal(padded["x"][:3], arrays["x"])
    # wrap order: rows 3..7 repeat 0,1,2,0,1
    np.testing.assert_array_equal(padded["x"][3], arrays["x"][0])
    np.testing.assert_array_equal(padded["x"][7], arrays["x"][1])


def test_device_batch_pads_and_shards(mesh8):
    batch = {
        "img": np.random.default_rng(0).normal(size=(3, 16, 8)).astype(np.float32),
        "label": np.array([0, 1, 2]),
        "omic_means": np.ones((120,), np.float32),
        "patient_id": ["a", "b", "c"],  # host field, must be dropped
    }
    db = device_batch(batch, mesh8)
    assert db["img"].shape == (8, 16, 8)
    assert db["img"].sharding.spec == P("data")
    assert not db["img"].sharding.is_fully_replicated
    # omic_means is a per-dataset vector, replicated (not dim-0 sharded)
    assert db["omic_means"].sharding.is_fully_replicated
    assert "patient_id" not in db
    np.testing.assert_array_equal(np.asarray(db["label"]), [0, 1, 2, 0, 1, 2, 0, 1])


def _abmil_cfg(synth_root, tmp_path, mesh_shape, name):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / name)
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 64
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TEST.EVALUATOR = "Survival"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 3  # ragged on an 8-device mesh
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAINER.NAME = "ABMIL"
    cfg.MODEL.HIDDEN_DIM = 64
    cfg.TPU.MESH_SHAPE = mesh_shape
    cfg.TPU.PREFETCH = 0
    return cfg


def test_one_vs_eight_device_step_and_eval_equivalence(synth_root, tmp_path):
    """A genuinely sharded batch-8 train step and a ragged (batch-3, padded)
    eval must match the 1-device results."""
    t1 = build_trainer(_abmil_cfg(synth_root, tmp_path, (1,), "m1"))
    t8 = build_trainer(_abmil_cfg(synth_root, tmp_path, (8,), "m8"))
    assert int(np.prod(list(t8.mesh.shape.values()))) == 8

    # identical init (same seed/rng draw sequence)
    p1, p8 = jax.device_get((t1.params, t8.params))
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p8)

    # eval with ragged batch 3 -> wrap-padded to 8 on the 8-device mesh;
    # metrics must be exact (pad rows dropped after readback)
    r1 = t1.test(split="test")
    r8 = t8.test(split="test")
    assert np.isclose(r1, r8, rtol=0, atol=1e-9), (r1, r8)

    # one full train step on the same batch
    batch = next(iter(t1.train_loader))
    m1 = t1.train_step(dict(batch))
    m8 = t8.train_step(dict(batch))
    l1, l8 = float(m1["loss"]), float(m8["loss"])
    assert np.isclose(l1, l8, rtol=1e-6, atol=1e-7), (l1, l8)
    p1, p8 = jax.device_get((t1.params, t8.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6), p1, p8
    )


def test_mbtrain_gan_step_batch8_sharded(synth_root, tmp_path):
    """Full UMEML_GAN train step (all four optimizers) with batch 8 truly
    sharded over the 8-device mesh."""
    import jax.numpy as jnp

    from imp_tpu.engine.trainer import device_batch as dbat

    cfg = _abmil_cfg(synth_root, tmp_path, (8,), "gan8")
    cfg.TRAINER.NAME = "MBTRAIN"
    cfg.MODEL.NAME = "umeml_gan"
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TASK.LOSS = "nllsurvloss_new"
    cfg.TEST.EVALUATOR = "Survival_UMEML"
    trainer = build_trainer(cfg)
    batch = next(iter(trainer.train_loader))
    db = dbat(trainer._host_batch(batch, train=True), trainer.mesh)
    assert db["img"].shape[0] == 8 and db["img"].sharding.spec == P("data")
    step = trainer._train_steps[True]
    trainer.state, metrics, _ = step(
        trainer.state, db, jax.random.PRNGKey(0), jnp.float32(0.1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_gen"]))
