"""Tensor parallelism for the CLIP vision tower: the Megatron-style
shard_map path (imp_tpu/parallel/tensor.py) must reproduce the single-device
flax VisionTransformer bit-for-bit up to float reassociation, on a
(data x model) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from imp_tpu.models.clip import TextTransformer, VisionTransformer
from imp_tpu.parallel.tensor import (
    make_tp_encode,
    make_tp_encode_text,
    put_tp_params,
    split_text_params_tp,
    split_vision_params_tp,
)


def _tiny_vit():
    return VisionTransformer(
        input_resolution=32, patch_size=16, width=64, layers=2, heads=4,
        output_dim=32,
    )


def _mesh(dp, tp):
    devs = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2)])
def test_tp_encode_matches_single_device(rng, dp, tp):
    vit = _tiny_vit()
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), images[:1])
    want = vit.apply(params, images)

    mesh = _mesh(dp, tp)
    tp_params = put_tp_params(split_vision_params_tp(params, tp), mesh)
    got = make_tp_encode(vit, mesh)(tp_params, images)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_requires_divisible_heads(rng):
    vit = VisionTransformer(
        input_resolution=32, patch_size=16, width=60, layers=1, heads=3,
        output_dim=16,
    )
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), images)
    mesh = _mesh(4, 2)
    with pytest.raises(Exception):
        # 3 heads cannot split 2 ways: param split fails (60 % 2 == 0 so the
        # column chunking would "work", but the head assert inside the
        # sharded forward must reject it)
        tp_params = put_tp_params(split_vision_params_tp(params, 2), mesh)
        make_tp_encode(vit, mesh)(tp_params, images)


def test_tp_text_tower_matches_single_device(rng):
    txt = TextTransformer(context_length=12, vocab_size=64, width=32,
                          heads=4, layers=2, embed_dim=16)
    tokens = jnp.asarray(rng.integers(1, 64, size=(4, 12)), jnp.int32)
    params = txt.init(jax.random.PRNGKey(0), tokens[:1])
    want = txt.apply(params, tokens)
    mesh = _mesh(2, 4)
    tp_params = put_tp_params(split_text_params_tp(params, 4), mesh)
    got = make_tp_encode_text(txt, mesh)(tp_params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_converted_torch_weights_roundtrip(rng):
    """The tp split consumes the exact tree convert_torch_clip_state emits:
    head-major packed qkv columns chunk to whole heads (heads 4, tp 4 ->
    one head per device)."""
    vit = _tiny_vit()
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(1), images[:1])
    want = vit.apply(params, images)
    mesh = _mesh(2, 4)
    tp_params = put_tp_params(split_vision_params_tp(params, 4), mesh)
    got = make_tp_encode(vit, mesh)(tp_params, images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
