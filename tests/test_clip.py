"""Numerical parity: flax CLIP towers vs the reference's vendored torch CLIP
(executed as a black-box oracle with random weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from reference_shim import load_ref_module

from imp_tpu.models.clip import (
    CLIP_CONFIGS,
    build_text_tower,
    build_vision_tower,
    convert_torch_clip_state,
)


@pytest.fixture(scope="module")
def torch_clip():
    mod = load_ref_module("clip/model.py", "ref_clip_model")
    torch.manual_seed(0)
    # a tiny ViT-B/32-shaped CLIP (fewer layers for test speed)
    model = mod.CLIP(
        embed_dim=64,
        image_resolution=64,
        vision_layers=2,
        vision_width=96,  # heads=96//64 -> must divide; use 96? heads=1
        vision_patch_size=32,
        context_length=16,
        vocab_size=100,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
    )
    model = model.float().eval()
    return mod, model


def test_vision_tower_matches_torch(torch_clip):
    mod, model = torch_clip
    from imp_tpu.models.clip import VisionTransformer

    cfg = dict(
        input_resolution=64, patch_size=32, width=96, layers=2,
        heads=96 // 64 if 96 % 64 == 0 else 1, output_dim=64,
    )
    cfg["heads"] = 1  # torch used vision_width*32//64 = 48?? match attn heads
    # derive heads exactly like the reference CLIP.__init__ (width*32//64...)
    # for ViT path: heads = vision_width // 64 = 1 (96//64)
    vit = VisionTransformer(**cfg)

    # hack config dict above aside: convert weights and compare
    sd = {k: v for k, v in model.state_dict().items()}
    # local conversion using a fake config entry
    CLIP_CONFIGS["test"] = dict(
        embed_dim=64, image_resolution=64, vision_layers=2, vision_width=96,
        vision_patch_size=32, context_length=16, vocab_size=100,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
    )
    vparams, tparams = convert_torch_clip_state(sd, name="test")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model.encode_image(torch.tensor(img)).numpy()
    got = np.asarray(vit.apply(vparams, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_text_tower_matches_torch(torch_clip):
    mod, model = torch_clip
    sd = {k: v for k, v in model.state_dict().items()}
    CLIP_CONFIGS["test2"] = dict(
        embed_dim=64, image_resolution=64, vision_layers=2, vision_width=96,
        vision_patch_size=32, context_length=16, vocab_size=100,
        transformer_width=64, transformer_heads=4, transformer_layers=2,
    )
    _, tparams = convert_torch_clip_state(sd, name="test2")
    from imp_tpu.models.clip import TextTransformer

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
