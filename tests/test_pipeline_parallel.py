"""Pipeline parallelism for the CLIP vision tower: the GPipe shard_map path
(imp_tpu/parallel/pipeline.py) must reproduce the single-device flax
VisionTransformer on a (data x pipe) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from imp_tpu.models.clip import VisionTransformer
from imp_tpu.parallel.pipeline import (
    make_pp_encode,
    put_pp_params,
    split_vision_params_pp,
)


def _tiny_vit(layers=4):
    return VisionTransformer(
        input_resolution=32, patch_size=16, width=64, layers=layers, heads=4,
        output_dim=32,
    )


def _mesh(dp, pp):
    devs = np.asarray(jax.devices()[: dp * pp]).reshape(dp, pp)
    return Mesh(devs, ("data", "pipe"))


@pytest.mark.parametrize("dp,pp,mb", [(2, 4, 4), (2, 4, 2), (4, 2, 2)])
def test_pp_encode_matches_single_device(rng, dp, pp, mb):
    vit = _tiny_vit()
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), images[:1])
    want = vit.apply(params, images)

    mesh = _mesh(dp, pp)
    pp_params = put_pp_params(split_vision_params_pp(params, pp), mesh)
    got = make_pp_encode(vit, mesh, num_microbatches=mb)(pp_params, images)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_requires_divisible_layers(rng):
    vit = _tiny_vit(layers=3)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), images)
    with pytest.raises(AssertionError):
        split_vision_params_pp(params, 2)
