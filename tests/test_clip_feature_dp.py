"""tools/clip_feature_dp.py drive: tiny ViT over an 8-device CPU mesh,
verifying the reference tree layout, h5 key, and batch padding removal."""

import importlib.util
import os.path as osp
import sys

import h5py
import numpy as np
import pytest

REPO = osp.join(osp.dirname(osp.abspath(__file__)), "..")


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, osp.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_clip_feature_dp_sharded_extraction(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    from PIL import Image

    from imp_tpu.models.clip import CLIP_CONFIGS

    # tiny tower so init+jit is fast on CPU
    CLIP_CONFIGS["ViT-B/32"] = dict(
        embed_dim=16, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, context_length=8, vocab_size=100,
        transformer_width=16, transformer_heads=2, transformer_layers=1,
    )

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for slide, n in (("s0", 5), ("s1", 2)):
        d = root / "tcga_x" / "images" / "train" / slide
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}_{i}.png")
    (root / "tcga_x" / "images" / "train" / "single").mkdir()
    Image.fromarray(
        rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    ).save(root / "tcga_x" / "images" / "train" / "single" / "0_0.png")

    out = tmp_path / "feat"
    monkeypatch.setattr(
        sys, "argv",
        ["clip_feature_dp.py", "--root", str(root), "--dataset", "tcga_x",
         "--output-dir", str(out), "--model", "clip_vit_b32",
         "--random-weights", "--batch-size", "3"],
    )
    tool = _load_tool("clip_feature_dp")
    tool.main()

    base = out / "clip_vit_b32" / "tcga_x"
    with h5py.File(base / "s0.h5") as f:
        feats = f["clip_feature"][:]
    assert feats.shape == (5, 16)  # padding rows stripped
    assert np.isfinite(feats).all()
    with h5py.File(base / "s1.h5") as f:
        assert f["clip_feature"].shape == (2, 16)
    # reference behavior: slides with <=1 patch are skipped
    assert not (base / "single.h5").exists()
    # resume: a second run skips completed slides without error
    tool.main()


def test_clip_feature_serial_extraction_and_atomic_resume(tmp_path, monkeypatch):
    """tools/clip_feature.py end-to-end: extraction writes the --key dataset,
    completed slides are skipped on re-run, and a leftover .h5.tmp from an
    interrupted run neither blocks re-extraction nor survives it."""
    pytest.importorskip("PIL")
    from PIL import Image

    from imp_tpu.models.clip import CLIP_CONFIGS

    CLIP_CONFIGS["ViT-B/32"] = dict(
        embed_dim=16, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, context_length=8, vocab_size=100,
        transformer_width=16, transformer_heads=2, transformer_layers=1,
    )

    src = tmp_path / "patches"
    rng = np.random.default_rng(1)
    for slide, n in (("sA", 4), ("sB.v1", 3)):  # dotted id: resume must not truncate it
        d = src / slide
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")

    dst = tmp_path / "feat"
    argv = ["clip_feature.py", "--src", str(src), "--dst", str(dst),
            "--random-weights", "--batch-size", "3", "--key", "feat",
            "--platform", "cpu"]
    monkeypatch.setattr(sys, "argv", argv)
    tool = _load_tool("clip_feature")
    tool.main()

    with h5py.File(dst / "sA.h5") as f:
        assert f["feat"].shape == (4, 16)
    with h5py.File(dst / "sB.v1.h5") as f:
        assert f["feat"].shape == (3, 16)
    assert not list(dst.glob("*.tmp"))

    # simulate an interrupted extraction: delete one output, leave its tmp
    (dst / "sA.h5").unlink()
    (dst / "sA.h5.tmp").write_bytes(b"partial")
    tool.main()  # skips sB.v1 (exists), re-extracts sA despite the tmp
    with h5py.File(dst / "sA.h5") as f:
        assert f["feat"].shape == (4, 16)
    assert not list(dst.glob("*.tmp"))


def test_uint8_device_normalize_matches_host_preprocess(tmp_path):
    """The uint8-H2D pipeline (host resize/crop only, normalize fused on
    device) must produce the same tensor as the original host-side fp32
    preprocess (reference clip.load() preprocess semantics)."""
    pytest.importorskip("PIL")
    import jax.numpy as jnp
    from PIL import Image

    cf = _load_tool("clip_feature")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    p = tmp_path / "patch.png"
    Image.fromarray(img).save(p)

    host = cf.preprocess(str(p), 32)  # fp32, normalized on host
    u8 = cf.preprocess(str(p), 32, as_uint8=True)
    dev = np.asarray(cf.device_normalize(jnp.asarray(u8), jnp.float32))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)
