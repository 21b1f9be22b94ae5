"""Pathology-prototype initialization from PLIP text embeddings.

The reference re-trains a 512->256 linear autoencoder on PLIP prompt
embeddings at **every model construction**
(``extract_prototype_with_plip_train.py:35-112`` called from
``umeml_gan.py:310``) — and then immediately overwrites the result with
uniform init (``umeml_gan.py:315``).  Here:

* the default init is uniform (matching the reference's effective behavior);
* ``MODEL.UMEML.PROTO_INIT=plip`` loads prototypes from a cached ``.npy``
  produced once by ``tools/extract_prototypes.py`` (which trains the same
  tiny AE under jit in seconds) — falling back to uniform with a warning if
  the cache or the PLIP weights are unavailable (zero-egress environments).
"""

from __future__ import annotations

import os.path as osp
import warnings

import jax.numpy as jnp
import numpy as np

from .layers import proto_init

PROTO_CACHE = "prototypes_plip.npy"


def plip_prototype_init(cfg, n_proto: int, hidden: int):
    cache = osp.join(cfg.OUTPUT_DIR, PROTO_CACHE)
    alt = osp.join(osp.abspath(osp.expanduser(cfg.DATASET.ROOT)), PROTO_CACHE)

    def init(key, shape, dtype=jnp.float32):
        for path in (cache, alt):
            if osp.isfile(path):
                arr = np.load(path)
                assert arr.shape == (1, n_proto, hidden), arr.shape
                return jnp.asarray(arr, dtype)
        warnings.warn(
            "PROTO_INIT=plip requested but no cached prototypes found "
            f"({cache} / {alt}); falling back to uniform init"
        )
        return proto_init(n_proto)(key, shape, dtype)

    return init
