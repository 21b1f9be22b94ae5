"""Numerical parity: flax CLIP towers vs the reference's vendored torch CLIP
(executed as a black-box oracle with random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from reference_shim import load_ref_module

from imp_tpu.models.clip import (
    CLIP_CONFIGS,
    TextTransformer,
    VisionTransformer,
    convert_torch_clip_state,
)

# a small ViT-shaped CLIP for test speed (2 layers each tower)
TEST_CFG = dict(
    embed_dim=64, image_resolution=64, vision_layers=2, vision_width=96,
    vision_patch_size=32, context_length=16, vocab_size=100,
    transformer_width=64, transformer_heads=4, transformer_layers=2,
)


@pytest.fixture(scope="module")
def torch_clip():
    mod = load_ref_module("clip/model.py", "ref_clip_model")
    torch.manual_seed(0)
    model = mod.CLIP(
        embed_dim=TEST_CFG["embed_dim"],
        image_resolution=TEST_CFG["image_resolution"],
        vision_layers=TEST_CFG["vision_layers"],
        vision_width=TEST_CFG["vision_width"],
        vision_patch_size=TEST_CFG["vision_patch_size"],
        context_length=TEST_CFG["context_length"],
        vocab_size=TEST_CFG["vocab_size"],
        transformer_width=TEST_CFG["transformer_width"],
        transformer_heads=TEST_CFG["transformer_heads"],
        transformer_layers=TEST_CFG["transformer_layers"],
    ).float().eval()
    CLIP_CONFIGS["test"] = dict(TEST_CFG)
    vparams, tparams = convert_torch_clip_state(model.state_dict(), name="test")
    return model, vparams, tparams


def test_vision_tower_matches_torch(torch_clip):
    model, vparams, _ = torch_clip
    vit = VisionTransformer(
        input_resolution=64, patch_size=32, width=96,
        layers=2, heads=96 // 64, output_dim=64,  # heads like ref: width//64
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.tensor(img)).numpy()
    got = np.asarray(vit.apply(vparams, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_text_tower_matches_torch(torch_clip):
    model, _, tparams = torch_clip
    txt = TextTransformer(
        context_length=16, vocab_size=100, width=64, heads=4, layers=2, embed_dim=64
    )
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, 90, size=(4, 16))
    tokens[:, 0] = 1
    tokens[:, -1] = 99  # EOT = max id
    with torch.no_grad():
        want = model.encode_text(torch.tensor(tokens, dtype=torch.long)).numpy()
    got = np.asarray(txt.apply(tparams, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


RN_TEST_CFG = dict(
    embed_dim=32, image_resolution=64, vision_layers=(1, 1, 2, 1),
    vision_width=16, vision_patch_size=None, context_length=16,
    vocab_size=100, transformer_width=64, transformer_heads=4,
    transformer_layers=2,
)


def test_modified_resnet_matches_torch():
    """ModifiedResNet + AttentionPool2d vs the reference torch tower
    (ref clip/model.py:10-164), including converted BN running stats."""
    from imp_tpu.models.clip import ModifiedResNet

    mod = load_ref_module("clip/model.py", "ref_clip_model")
    torch.manual_seed(1)
    model = mod.CLIP(
        embed_dim=RN_TEST_CFG["embed_dim"],
        image_resolution=RN_TEST_CFG["image_resolution"],
        vision_layers=RN_TEST_CFG["vision_layers"],
        vision_width=RN_TEST_CFG["vision_width"],
        vision_patch_size=None,
        context_length=RN_TEST_CFG["context_length"],
        vocab_size=RN_TEST_CFG["vocab_size"],
        transformer_width=RN_TEST_CFG["transformer_width"],
        transformer_heads=RN_TEST_CFG["transformer_heads"],
        transformer_layers=RN_TEST_CFG["transformer_layers"],
    ).float()
    rng = np.random.default_rng(2)
    # one train-mode forward perturbs BN running stats away from (0, 1)
    # so the test actually checks the batch_stats conversion
    model.train()
    with torch.no_grad():
        model.encode_image(
            torch.tensor(rng.normal(size=(2, 3, 64, 64)).astype(np.float32))
        )
    model.eval()

    CLIP_CONFIGS["test_rn"] = dict(RN_TEST_CFG)
    vparams, _ = convert_torch_clip_state(model.state_dict(), name="test_rn")
    assert "batch_stats" in vparams

    tower = ModifiedResNet(
        layers=RN_TEST_CFG["vision_layers"],
        output_dim=RN_TEST_CFG["embed_dim"],
        heads=RN_TEST_CFG["vision_width"] * 32 // 64,
        input_resolution=RN_TEST_CFG["image_resolution"],
        width=RN_TEST_CFG["vision_width"],
    )
    img = rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.tensor(img)).numpy()
    got = np.asarray(tower.apply(vparams, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_available_models_parity():
    """Every reference clip.available_models() name has a loadable config
    (ref clip/clip.py _MODELS)."""
    from imp_tpu.models.clip import available_models, build_vision_tower

    ref_names = {"RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
                 "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px"}
    have = set(available_models())
    missing = ref_names - have
    assert not missing, f"missing towers: {missing}"
    for n in ref_names:
        build_vision_tower(n)  # constructible


def test_full_size_vit_b32_checkpoint_roundtrip(tmp_path):
    """A REAL-architecture ViT-B/32 torch state_dict (random weights, full
    12+12 layers, 224px, 49408 vocab) saved to disk loads through
    tools/clip_feature.load_checkpoint_params with forward parity — the
    offline stand-in for loading OpenAI's ViT-B-32.pt (zero egress here;
    see BASELINE.md waiver)."""
    import importlib.util
    import os.path as osp
    import sys as _sys

    mod = load_ref_module("clip/model.py", "ref_clip_model_full")
    torch.manual_seed(7)
    model = mod.CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12,
        vision_width=768, vision_patch_size=32, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    ).float().eval()
    ckpt = tmp_path / "ViT-B-32.pt"
    torch.save(model.state_dict(), ckpt)

    repo = osp.join(osp.dirname(osp.abspath(__file__)), "..")
    spec = importlib.util.spec_from_file_location(
        "clip_feature_tool", osp.join(repo, "tools", "clip_feature.py")
    )
    tool = importlib.util.module_from_spec(spec)
    _sys.modules["clip_feature_tool"] = tool
    spec.loader.exec_module(tool)

    vparams = tool.load_checkpoint_params(str(ckpt), "ViT-B/32")

    from imp_tpu.models.clip import build_vision_tower

    tower = build_vision_tower("ViT-B/32")
    rng = np.random.default_rng(5)
    img = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.tensor(img)).numpy()
    got = np.asarray(
        tower.apply(vparams, jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
