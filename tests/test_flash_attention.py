"""Flash-attention correctness: kernel (interpret/XLA fallback on CPU)
vs the dense reference implementation, with masks."""

import jax
import jax.numpy as jnp
import numpy as np

from imp_tpu.ops.attention import dense_attention, TransLayer
from imp_tpu.ops.flash_attention import flash_attention


def test_flash_matches_dense_masked():
    rng = np.random.default_rng(0)
    b, h, nq, nk, d = 2, 4, 64, 96, 32
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
    mask = jnp.asarray(np.arange(nk)[None, :] < np.array([[60], [96]]))
    out = flash_attention(q, k, v, mask=mask)
    want, _, _ = dense_attention(q * (d**-0.5), k, v, key_valid=mask, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_flash_translayer_runs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 40, 64)), jnp.float32)
    mask = jnp.asarray(np.arange(40)[None, :] < np.array([[30], [40]]))
    layer = TransLayer(dim=64, impl="flash")
    params = layer.init(jax.random.PRNGKey(0), x, mask=mask)
    y = layer.apply(params, x, mask=mask)
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
    # same param structure as the nystrom variant minus landmarks
    keys = params["params"]["attn"].keys()
    assert {"to_qkv", "to_out", "res_conv"} <= set(keys)
