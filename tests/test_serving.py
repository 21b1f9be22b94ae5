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


def test_predict_many_chunks_and_http_server(synth_root, tmp_path):
    """Oversized batches chunk through the AOT program losslessly, and the
    stdlib HTTP host (tools/serve.py backend) round-trips JSON requests —
    ragged bags, auto batching, risk outputs, input validation."""
    import json
    import threading
    import urllib.request

    from imp_tpu.serving import make_http_server

    cfg = _cfg(synth_root, tmp_path, "MBTRAIN", model_name="umeml_gan")
    trainer = build_trainer(cfg)
    out = str(tmp_path / "exported")
    export_trainer(trainer, out)
    served = load_model(out)

    # ---- predict_many: 6 samples through an exported batch size of 4 ----
    rng = np.random.default_rng(7)
    bags = [rng.normal(size=(n, 32)).astype(np.float32)
            for n in (20, 37, 5, 64, 11, 48)]
    mol = rng.lognormal(size=(6, 120)).astype(np.float32)
    got = served.predict_many({"img": bags, "mol": mol})
    assert got["logits"].shape[0] == 6
    # chunking is exact: same outputs as direct per-chunk predict calls
    B = served.batch_size
    assert B < 6  # the tiny split exports a small batch — chunking engages
    expect = np.concatenate([
        served.predict({"img": bags[s:s + B], "mol": mol[s:s + B]})["logits"]
        for s in range(0, 6, B)
    ])
    np.testing.assert_allclose(got["logits"], expect, rtol=0, atol=0)

    # replicated inputs (omic_means) must NOT be sliced per chunk: an
    # explicit omic_means (as a plain JSON-style list, the HTTP case) gives
    # identical outputs to the aux-supplied default it duplicates
    means = [float(x) for x in np.asarray(trainer.omic_means, np.float32)]
    got_rep = served.predict_many({"img": bags, "mol": mol,
                                   "omic_means": means})
    np.testing.assert_allclose(got_rep["logits"], got["logits"],
                               rtol=0, atol=0)

    # malformed per-sample inputs raise instead of silently broadcasting
    # (5 mol rows for 6 bags must not be replicated to every chunk)
    with pytest.raises(ValueError, match="per-sample input 'mol'"):
        served.predict_many({"img": bags, "mol": mol[:5]})

    # ---- HTTP host on an ephemeral port ----
    server = make_http_server(out, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def call(path, payload=None, expect=200):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=None if payload is None else json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    assert r.status == expect
                    return json.loads(r.read())
            except urllib.error.HTTPError as e:
                assert e.code == expect, e.read()
                return json.loads(e.read())

        health = call("/health")
        assert health["status"] == "ok" and health["model"] == "umeml_gan"
        assert health["batch_size"] == B and health["bag_pad"] == 64

        resp = call("/predict", {
            "batch": {"img": [b.tolist() for b in bags],
                      "mol": mol.tolist()},
            "risk": True,
        })
        assert resp["batch_size"] == 6
        np.testing.assert_allclose(
            np.asarray(resp["outputs"]["logits"], np.float32),
            got["logits"], rtol=0, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(resp["risk"]),
            served.predict_risk({"img": bags, "mol": mol}),
            rtol=1e-6, atol=1e-6,
        )
        # input validation surfaces as 400, not a dead connection
        err = call("/predict", {"batch": {}}, expect=400)
        assert "error" in err
        err = call("/predict", {"batch": {"mol": [[1.0, 2.0]]}}, expect=400)
        assert "error" in err
        assert "error" in call("/nope", {}, expect=404)

        # "risk" on a non-survival artifact is a 400 client error
        server.serving_model.manifest["task"] = "Grading"
        err = call("/predict", {
            "batch": {"img": [bags[0].tolist()], "mol": [mol[0].tolist()]},
            "risk": True,
        }, expect=400)
        assert "survival" in err["error"]
        server.serving_model.manifest["task"] = "Survival"

        # genuine server-side failures report 500, not 400
        def boom(batch):
            raise RuntimeError("injected device failure")

        server.serving_model.predict_many = boom
        err = call("/predict", {"batch": {"mol": mol.tolist()}}, expect=500)
        assert "injected device failure" in err["error"]
        del server.serving_model.predict_many
    finally:
        server.shutdown()
        server.server_close()
