"""End-to-end training-loop integration tests on the synthetic dataset
(SURVEY.md §4(c)): data -> model -> jitted step -> eval -> checkpoint."""

import os.path as osp

import numpy as np
import pytest

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("traindata"))
    synthetic.materialize(
        root, num_slides=24, bag_min=24, bag_max=48, feat_dim=32,
        num_genes=120, group_size=15, seed=0,
    )
    return root


def _cfg(synth_root, tmp_path, trainer, model_name=None, task="Survival",
         dataset="TCGA_Glioma_S_UMEML", epochs=2):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = dataset
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 64
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = task
    cfg.TASK.LOSS = "nllsurvloss_new" if task == "Survival" else "celoss"
    cfg.TEST.EVALUATOR = "Survival_UMEML" if task == "Survival" else "Classification"
    cfg.TEST.FINAL_MODEL = "best_val"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.OPTIM.MAX_EPOCH = epochs
    cfg.OPTIM.LR = 2e-4
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.TRAIN.PRINT_FREQ = 100
    cfg.TRAINER.NAME = trainer
    if model_name:
        cfg.MODEL.NAME = model_name
    cfg.MODEL.HIDDEN_DIM = 64
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TPU.PREFETCH = 0
    return cfg


def test_abmil_survival_end_to_end(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "ABMIL", task="Survival")
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert result is not None and np.isfinite(result)
    # checkpoints with pointer + best exist
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "model", "checkpoint"))
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "model", "model-best.ckpt"))


def test_abmil_resume(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "ABMIL", task="Survival", epochs=2)
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    trainer = build_trainer(cfg)
    trainer.train()
    # resume: a new trainer picks up at epoch 2 == max -> no epochs run
    cfg2 = cfg.clone()
    trainer2 = build_trainer(cfg2)
    trainer2.train()
    assert trainer2.start_epoch == 2


def test_snn_grading_end_to_end(synth_root, tmp_path):
    cfg = _cfg(
        synth_root, tmp_path, "SNN", task="Grading", dataset="TCGA_Glioma_G", epochs=2
    )
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)


def test_mbtrain_umeml_gan_survival(synth_root, tmp_path):
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan", task="Survival",
        epochs=3,
    )
    # tiny curriculum: GAN from epoch 1, replacement from epoch 2, CCA on
    cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = 1
    cfg.TRAIN.CURRICULUM.REPLACE_START_EPOCH = 2
    cfg.TRAIN.CURRICULUM.CCA_ACCUM_BATCHES = 3
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)
    # importance dumps written with one row per eval sample, 6 prototypes
    imp = np.loadtxt(osp.join(cfg.OUTPUT_DIR, "test_path.txt"))
    assert imp.shape[1] == 6
    assert imp.shape[0] == len(trainer.test_loader.dataset)
    assert (imp >= 0.5 - 1e-6).all() and (imp <= 1.0 + 1e-6).all()


def test_mbtrain_eval_omics_ablation(synth_root, tmp_path):
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan", task="Survival",
        epochs=1,
    )
    cfg.TRAIN.CURRICULUM.ENABLE = False
    cfg.TEST.NO_TEST = True
    trainer = build_trainer(cfg)
    trainer.train()
    # full omics removal must still produce finite metrics (GAN imputation)
    r = trainer.test(split="test", umeml_gan_test_without_omic_ratio=1.0)
    assert np.isfinite(r)
    r2 = trainer.test(
        split="test", umeml_gan_test_insample_without_omic_ratio=0.5
    )
    assert np.isfinite(r2)


def test_mbtrain_umeml_gan_grading(synth_root, tmp_path):
    """UMEML_GAN on a classification task: CE + KD + modularity dispatch,
    Classification_UMEML evaluator."""
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan", task="Grading",
        dataset="TCGA_Glioma_G_UMEML", epochs=2,
    )
    cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = 1
    cfg.TRAIN.CURRICULUM.CCA_EVERY_EPOCH = False
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)


def test_mbtrain_umeml_nongan_survival(synth_root, tmp_path):
    """UMEML (no GAN) under MBTRAIN: single-optimizer jitted step, modularity
    pair, Survival_UMEML evaluator (ref ``models/umeml.py`` + MBTRAIN)."""
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml", task="Survival",
        epochs=2,
    )
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)
    assert osp.exists(osp.join(cfg.OUTPUT_DIR, "model", "checkpoint"))


def test_mbtrain_use_bsm_multi_chunk_trains(synth_root, tmp_path):
    """DATASET.USE_BSM: chunk-averaged training (reference ``split_chunk`` +
    BSM branch, ``mbtrain.py:21-47,114-150``) — the 64-pad bag splits into
    four 16-token chunks; the loss is the chunk mean of task + ALPHA *
    modularity and every patch contributes."""
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml", task="Survival",
        epochs=2,
    )
    cfg.DATASET.USE_BSM = True
    cfg.DATASET.BS_MICRO = 16
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)


def test_mbtrain_use_bsm_matches_explicit_chunk_loop(synth_root, tmp_path):
    """The jitted BSM step's loss must equal an explicit python replication
    of the reference estimator on the same permutation: partition the padded
    bag into sorted BS_MICRO-token chunks, full forward per chunk, mean of
    task + ALPHA * modularity (ref ``mbtrain.py:21-47,114-150``) — this
    validates the scan/gather/mask plumbing bit-for-bit (the chunk dropout
    rng folds are replicated exactly)."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml", task="Survival",
        epochs=1,
    )
    cfg.DATASET.USE_BSM = True
    cfg.DATASET.BS_MICRO = 16
    cfg.MODEL.UMEML.ALPHA = 2.5
    trainer = build_trainer(cfg)
    batch = next(iter(trainer.train_loader))
    db = trainer._to_device_mb(
        trainer._host_batch(batch, train=True), batch, "train"
    )
    rng = jax.random.PRNGKey(7)

    # explicit replication of the step's chunking + rng folds
    rng_perm, rng_drop = jax.random.split(rng)
    n = db["img"].shape[1]
    n_chunks = -(-n // 16)
    perm = jax.random.permutation(rng_perm, n_chunks * 16)
    idx = jnp.sort(perm.reshape(n_chunks, 16), axis=1)
    total = 0.0
    for ci in range(n_chunks):
        take = idx[ci]
        sub = dict(db)
        sub["img"] = jnp.take(db["img"], take, axis=1)
        sub["img_mask"] = jnp.take(db["img_mask"], take, axis=1)
        out = trainer.model.apply(
            trainer.state["params"], sub, train=True,
            rngs={"dropout": jax.random.fold_in(rng_drop, take[0])},
        )
        total += float(
            trainer.task_loss(out["logits"], db)
            + 2.5 * out["modular_loss"]
        )
    want = total / n_chunks

    _, metrics = trainer._train_steps[False](trainer.state, db, rng)
    np.testing.assert_allclose(float(metrics["loss"]), want, rtol=2e-5)


def test_snnm_grading_end_to_end(synth_root, tmp_path):
    """SNNM trainer (chunked SNN + gated pooling, ref ``engine/snnm.py``)."""
    cfg = _cfg(
        synth_root, tmp_path, "SNNM", task="Grading", dataset="TCGA_Glioma_G",
        epochs=2,
    )
    trainer = build_trainer(cfg)
    result = trainer.train()
    assert np.isfinite(result)


def test_abmil_classification_end_to_end(synth_root, tmp_path):
    """Classification task (6-class integrated diagnosis) end to end."""
    cfg = _cfg(
        synth_root, tmp_path, "ABMIL", task="Classification",
        dataset="TCGA_Glioma_C", epochs=2,
    )
    trainer = build_trainer(cfg)
    assert trainer.num_classes == 6
    result = trainer.train()
    assert np.isfinite(result)


def test_porpoise_subtyping_end_to_end(synth_root, tmp_path):
    """Subtyping task through a fusion trainer end to end."""
    cfg = _cfg(
        synth_root, tmp_path, "Porpoise", task="Subtyping",
        dataset="TCGA_Glioma_Sub", epochs=2,
    )
    cfg.MODEL.FUSION = "bilinear"
    trainer = build_trainer(cfg)
    assert trainer.num_classes == 3
    result = trainer.train()
    assert np.isfinite(result)


def test_model_init_weights(synth_root, tmp_path):
    """MODEL.INIT_WEIGHTS loads a previous run's params into a new trainer
    (reference load_pretrained_weights semantics)."""
    cfg = _cfg(synth_root, tmp_path, "ABMIL", task="Survival", epochs=1)
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TEST.NO_TEST = True
    trainer = build_trainer(cfg)
    trainer.train()

    cfg2 = _cfg(synth_root, tmp_path / "b", "ABMIL", task="Survival", epochs=1)
    cfg2.TEST.EVALUATOR = "Survival"
    cfg2.TASK.LOSS = "nllsurvloss"
    cfg2.MODEL.INIT_WEIGHTS = str(tmp_path / "out" / "model")
    trainer2 = build_trainer(cfg2)
    import jax

    a = jax.tree_util.tree_leaves(trainer.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_and_no_donate_paths(synth_root, tmp_path):
    """TPU.REMAT=True (checkpointed forward) and TPU.DONATE=False both
    compile and train; remat must not change the result beyond fp noise."""
    cfg = _cfg(synth_root, tmp_path, "ABMIL", task="Survival", epochs=1)
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    cfg.TPU.REMAT = True
    cfg.TPU.DONATE = False
    r_remat = build_trainer(cfg).train()
    assert np.isfinite(r_remat)

    cfg2 = _cfg(synth_root, tmp_path / "b", "ABMIL", task="Survival", epochs=1)
    cfg2.TEST.EVALUATOR = "Survival"
    cfg2.TASK.LOSS = "nllsurvloss"
    r_plain = build_trainer(cfg2).train()
    assert r_remat == pytest.approx(r_plain, abs=1e-4)


def test_mbtrain_remat_gan_step(synth_root, tmp_path):
    """The rematerialized GAN main-phase forward compiles and trains."""
    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan",
        task="Survival", epochs=1,
    )
    cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = 0
    cfg.TPU.REMAT = True
    assert np.isfinite(build_trainer(cfg).train())


def test_umeml_gan_plot_similarity_pngs(synth_root, tmp_path):
    """umeml_gan_plot dumps one sim_<patient>.png per test sample
    (ref umeml_gan_plot.py:124-168)."""
    pytest.importorskip("matplotlib")
    import glob

    cfg = _cfg(
        synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan_plot",
        task="Survival", epochs=1,
    )
    trainer = build_trainer(cfg)
    assert np.isfinite(trainer.train())
    pngs = glob.glob(osp.join(cfg.OUTPUT_DIR, "plots", "sim_*.png"))
    assert len(pngs) == len(trainer.test_loader.dataset)


def test_mbtrain_cca_dropout_knob(synth_root, tmp_path):
    """TRAIN.CURRICULUM.CCA_DROPOUT=False runs the CCA alignment forward
    deterministically: its (h_path, h_omic) must be independent of the
    dropout rng, while the default (True, reference behavior
    ``trainer.py:694``) must depend on it."""
    import jax
    import jax.numpy as jnp

    for knob, expect_same in ((False, True), (True, False)):
        cfg = _cfg(
            synth_root, tmp_path / f"cca_{knob}", "MBTRAIN",
            model_name="umeml_gan", task="Survival", epochs=1,
        )
        cfg.TRAIN.CURRICULUM.CCA_DROPOUT = knob
        trainer = build_trainer(cfg)
        batch = next(iter(trainer.train_loader))
        db = trainer._to_device_mb(
            trainer._host_batch(batch, train=True), batch, "train"
        )
        hp1, ho1, _ = trainer._cca_values(
            trainer.state["params"], db, jax.random.PRNGKey(1)
        )
        hp2, ho2, _ = trainer._cca_values(
            trainer.state["params"], db, jax.random.PRNGKey(2)
        )
        same = bool(
            jnp.array_equal(hp1, hp2) and jnp.array_equal(ho1, ho2)
        )
        assert same == expect_same, (knob, same)
