"""AOT export + serving tests (imp_tpu/serving.py): the exported StableHLO
program must reproduce the live trainer's eval step exactly, and the
ServingModel padding contract (ragged bags, short batches) must be lossless.
The reference has no deployment path at all (inference only inside
``medmm/engine/trainer.py:550-581``) — this capability is TPU-native new."""

import numpy as np
import pytest

from imp_tpu.config import get_cfg_default
from imp_tpu.data import synthetic
from imp_tpu.engine import build_trainer
from imp_tpu.serving import export_trainer, load_model


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("servedata"))
    synthetic.materialize(
        root, num_slides=16, bag_min=16, bag_max=48, feat_dim=32,
        num_genes=120, group_size=15, seed=0,
    )
    return root


def _cfg(synth_root, tmp_path, trainer, model_name=None, n_devices=1):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.DATASET.ROOT = synth_root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 64
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss_new"
    cfg.TEST.EVALUATOR = "Survival_UMEML"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TRAINER.NAME = trainer
    if model_name:
        cfg.MODEL.NAME = model_name
    cfg.MODEL.HIDDEN_DIM = 64
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TPU.PREFETCH = 0
    cfg.TPU.MESH_SHAPE = (n_devices,)
    return cfg


def test_export_serve_roundtrip_mbtrain(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan")
    trainer = build_trainer(cfg)
    out = str(tmp_path / "exported")
    manifest = export_trainer(trainer, out)
    assert manifest["kind"] == "mbtrain"
    assert manifest["bag_pad"] == 64 and manifest["num_genes"] == 120

    served = load_model(out)
    raw = next(iter(trainer.test_loader))
    hb = trainer._host_batch(raw, train=False)
    want = np.asarray(trainer._eval_step(trainer.state["params"], hb)[0])
    got = served.predict(hb)
    np.testing.assert_allclose(got["logits"], want, rtol=0, atol=1e-6)
    # flagship exports its interpretability outputs too
    assert got["importance_path"].shape[0] == want.shape[0]
    assert got["importance_omic"].shape[0] == want.shape[0]
    # survival risk convenience matches the evaluator math
    risk = served.predict_risk(hb)
    hz = 1.0 / (1.0 + np.exp(-want))
    np.testing.assert_allclose(
        risk, -np.cumprod(1.0 - hz, axis=1).sum(axis=1), rtol=1e-6
    )


def test_serving_ragged_predict(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan")
    trainer = build_trainer(cfg)
    out = str(tmp_path / "exported")
    export_trainer(trainer, out)
    served = load_model(out)

    rng = np.random.default_rng(3)
    bags = [rng.normal(size=(20, 32)).astype(np.float32),
            rng.normal(size=(37, 32)).astype(np.float32)]
    mol = rng.lognormal(size=(2, 120)).astype(np.float32)
    got = served.predict({"img": bags, "mol": mol})
    assert got["logits"].shape[0] == 2  # pad rows dropped

    # reference computation: manual pad to the exported static shapes
    img = np.zeros((4, 64, 32), np.float32)
    mask = np.zeros((4, 64), bool)
    for i, bag in enumerate(bags + bags):  # wrap-pad repeats rows 0,1
        img[i, : len(bag)] = bag
        mask[i, : len(bag)] = True
    hb = {
        "img": img,
        "img_mask": mask,
        "mol": np.concatenate([mol, mol]),
        "without_omic": np.zeros((4,), np.float32),
        "insample_without_omic": np.zeros((4, 120), np.int32),
        "omic_means": np.asarray(trainer.omic_means, np.float32),
    }
    want = np.asarray(trainer._eval_step(trainer.state["params"], hb)[0])[:2]
    np.testing.assert_allclose(got["logits"], want, rtol=0, atol=1e-6)


def test_export_refuses_multidevice(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan",
               n_devices=-1)  # all 8 virtual devices
    trainer = build_trainer(cfg)
    with pytest.raises(ValueError, match="single-logical-device"):
        export_trainer(trainer, str(tmp_path / "exported"))


def test_export_cli_generic_trainer_with_checkpoint(synth_root, tmp_path):
    """tools/export_model.py end-to-end on a trained ABMIL checkpoint,
    including the --check reload-and-compare path."""
    cfg = _cfg(synth_root, tmp_path, "ABMIL")
    cfg.TEST.EVALUATOR = "Survival"
    cfg.TASK.LOSS = "nllsurvloss"
    trainer = build_trainer(cfg)
    trainer.train()

    import argparse

    from tools.export_model import main as export_main

    export_dir = str(tmp_path / "exported_abmil")
    export_main(argparse.Namespace(
        platform="", config_file="", root=synth_root, seed=1,
        trainer="ABMIL", model_dir=cfg.OUTPUT_DIR, load_epoch=None,
        export_dir=export_dir, platforms="", check=True,
        opts=[
            "DATASET.NAME", "TCGA_Glioma_S_UMEML",
            "DATASET.FEATURE_NAME", "features_clip_vit_b16",
            "DATASET.BAG_PAD", "64", "DATASET.PATH.DIM", "32",
            "TASK.NAME", "Survival", "TASK.LOSS", "nllsurvloss",
            "TEST.EVALUATOR", "Survival",
            "DATALOADER.TEST.BATCH_SIZE", "4",
            "MODEL.HIDDEN_DIM", "64", "TPU.PREFETCH", "0",
        ],
    ))
    served = load_model(export_dir)
    assert served.manifest["kind"] == "generic"
    # trained weights (not init) are what got exported: compare against the
    # live trainer's eval on one batch
    raw = next(iter(trainer.test_loader))
    from imp_tpu.engine.trainer import ARRAY_KEYS

    hb = {k: np.asarray(v) for k, v in raw.items() if k in ARRAY_KEYS}
    want = np.asarray(
        trainer._eval_step(trainer.params, trainer.model_state, hb)
    )
    np.testing.assert_allclose(
        served.predict(hb)["logits"], want, rtol=0, atol=1e-5
    )
