"""Genomic backbones: SNN / SNNM (reference ``medmm/modeling/backbone/``).

CLIPOMIC (CoOp-style prompt learner over the CLIP text encoder,
reference ``backbone/clipomic.py``) lives in ``models/clipomic.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Attn_Net_Gated, masked_attention_pool

# init_max_weights (reference ops/utils.py:86-100): N(0, 1/sqrt(fan_in))
def _max_weights_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    return jax.random.normal(key, shape, dtype) / math.sqrt(fan_in)


class MaxLinear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _max_weights_kernel_init, (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return x @ k + b


class SNNMaxBlock(nn.Module):
    """SNN_Block with init_max_weights (the reference applies
    ``init_max_weights`` after construction, ``backbone/snn.py:31``)."""

    dim2: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.blocks import AlphaDropout

        x = nn.elu(MaxLinear(self.dim2)(x))
        return AlphaDropout(self.dropout)(x, deterministic=deterministic)


class SNN(nn.Module):
    """4-layer self-normalizing MLP over the omics vector
    (reference ``backbone/snn.py:9-38``)."""

    num_mol: int = 1000
    dropout: float = 0.1
    model_size_omic: str = "small"

    @property
    def out_features(self):
        return {"small": 256, "big": 256}[self.model_size_omic]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = {"small": [256, 256, 256, 256], "big": [1024, 1024, 1024, 256]}[
            self.model_size_omic
        ]
        for i, dim in enumerate(hidden):
            drop = 0.25 if i == 0 else self.dropout
            x = SNNMaxBlock(dim, dropout=drop, name=f"fc_omic_{i}")(
                x, deterministic=deterministic
            )
        return x


class SNN_M(nn.Module):
    """SNN over (G/num_mol, num_mol) chunks + gated-attention pooling
    (reference ``backbone/snnm.py:11-58``), per-sample."""

    num_mol: int = 50
    dropout: float = 0.1
    model_size_omic: str = "small"

    @property
    def out_features(self):
        return {"small": 256, "big": 256}[self.model_size_omic]

    @nn.compact
    def __call__(self, x_omic, deterministic: bool = True):
        hidden = {"small": [256, 256, 256, 256], "big": [1, 1024, 1024, 256]}[
            self.model_size_omic
        ]
        b = x_omic.shape[0]
        g = x_omic.shape[-1]
        n_chunks = g // self.num_mol
        h = x_omic[:, : n_chunks * self.num_mol].reshape(b, n_chunks, self.num_mol)
        for i, dim in enumerate(hidden):
            drop = 0.25 if i == 0 else self.dropout
            h = SNNMaxBlock(dim, dropout=drop, name=f"fc_omic_{i}")(
                h, deterministic=deterministic
            )
        h = nn.relu(MaxLinear(hidden[2], name="fc")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        A, h = Attn_Net_Gated(D=hidden[3], dropout=self.dropout > 0, name="attention_net")(
            h, deterministic=deterministic
        )
        pooled, _ = masked_attention_pool(A, h)
        out = nn.relu(MaxLinear(hidden[3], name="rho")(pooled[:, 0]))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
