"""Shared UMEML building blocks (reference ``medmm/modeling/models/umeml.py``
/ ``umeml_gan.py`` inner classes), batched over slides with masks instead of
per-slide Python loops."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiheadAttention, TorchLinear, TransLayer
from ..ops.pairing import (
    cosine_similarity_matrix,
    gather_tokens,
    greedy_topk_pairs,
    remove_indices_keep_order,
)

uniform01 = nn.initializers.uniform(scale=1.0)  # torch nn.init.uniform_ default


def proto_init(n_c: int):
    """reset(): U(-1/n_c, 1/n_c) (reference ``umeml.py:18``)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -1.0 / n_c, 1.0 / n_c)

    return init


class GroupedLinear(nn.Module):
    """K parallel Linear layers evaluated as ONE batched einsum.

    Replaces the reference's per-gene-group Python loop of tiny matmuls
    (``umeml_gan.py:371-377`` -> six [1, G_k] x [G_k, D] ops per sample)
    with a single ``bkg,kgd->bkd`` contraction over zero-padded groups —
    one MXU dispatch instead of K. Rows of ``kernel[k]`` past group k's
    true fan-in are zero-initialized AND their gathered inputs are zeroed
    by the caller, so both forward values and gradients match K separate
    torch Linears exactly (pad rows get x=0 -> grad 0, stay 0 forever).

    Init matches torch's per-layer U(-1/sqrt(fan_in_k), +) using each
    group's TRUE fan-in.
    """

    group_sizes: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self, x):  # [B, K, Gmax] with pad positions already zero
        k = len(self.group_sizes)
        gmax = x.shape[-1]
        sizes = jnp.asarray(self.group_sizes)

        def kernel_init(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, k)
            mats = []
            for i, g in enumerate(self.group_sizes):
                bound = 1.0 / (g**0.5) if g > 0 else 0.0
                m = jax.random.uniform(
                    keys[i], (gmax, self.features), dtype, -bound, bound
                )
                mats.append(jnp.where(jnp.arange(gmax)[:, None] < g, m, 0.0))
            return jnp.stack(mats)

        def bias_init(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, k)
            rows = []
            for i, g in enumerate(self.group_sizes):
                bound = 1.0 / (g**0.5) if g > 0 else 0.0
                rows.append(
                    jax.random.uniform(keys[i], (self.features,), dtype, -bound, bound)
                )
            return jnp.stack(rows)

        del sizes
        kernel = self.param("kernel", kernel_init, (k, gmax, self.features))
        bias = self.param("bias", bias_init, (k, self.features))
        y = jnp.einsum(
            "bkg,kgd->bkd", x, kernel, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return y + bias


class PathProtoGenerator(nn.Module):
    """Prototype refinement: c + LN(CrossAttn(c, bag, bag)), one head
    (reference ``umeml_gan.py:65-80``), batched with a key mask replacing the
    per-slide loop (``umeml_gan.py:425-434``)."""

    dim: int
    seq_axis: Optional[str] = None  # bag sharded over this mesh axis

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, D] bag (local shard under seq_axis)
        c: jnp.ndarray,  # [B, P, D] prototypes
        key_valid: Optional[jnp.ndarray] = None,  # [B, N]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        _c, _ = MultiheadAttention(
            embed_dim=self.dim, num_heads=1, seq_axis=self.seq_axis,
            name="cross_attn",
        )(
            c, x, x, key_valid=key_valid, need_raw=True, deterministic=deterministic
        )
        return c + nn.LayerNorm(epsilon=1e-5, name="norm1")(_c)


class Block(nn.Module):
    """TransLayer wrapper (reference ``umeml_gan.py:86-96``)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        return TransLayer(dim=self.dim, name="attn")(
            x, mask=mask, deterministic=deterministic
        )


class BottleneckAttentionBlock(nn.Module):
    """Bottleneck-token multimodal encoder.

    Plain variant (reference ``umeml.py:58-83``): concat
    [x_path, bottle_tokens, x_omic] through TransLayer x2 and split back.

    Paired variant (``use_pairing=True``, reference ``umeml_gan.py:100-229``):
    greedy top-K cosine pairing of path/omic tokens, per-pair fusion tokens
    ``linear_p(p)+linear_o(o)``, sequence
    [fused(K), remaining_p, bottle, remaining_o] — vectorized, fixed shapes.
    The split indices follow the reference exactly (they are computed from
    the ORIGINAL path length, so t_path is the first fused token and t_omic
    the first remaining omic token, ``umeml_gan.py:227-228``).
    """

    dim: int = 256
    n_reg: int = 2
    use_pairing: bool = False
    topk: int = 3

    @nn.compact
    def __call__(
        self,
        x_path: jnp.ndarray,  # [B, P, D]
        x_omic: jnp.ndarray,  # [B, O, D]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, path_len, d = x_path.shape
        omic_len = x_omic.shape[1]
        bottle = self.param("bottle_tokens", uniform01, (1, self.n_reg, d))
        token_len = self.n_reg
        bottle_b = jnp.tile(bottle, (b, 1, 1))

        if not self.use_pairing:
            x = jnp.concatenate([x_path, bottle_b, x_omic], axis=1)
        else:
            k = self.topk
            sim = cosine_similarity_matrix(x_path, x_omic)
            # expose the pre-pairing similarity grid for the plot variant
            # (reference ``umeml_gan_plot.py:124-168`` draws it per sample;
            # we sow it here and render on host AFTER the jitted forward)
            self.sow("intermediates", "similarity", sim)
            rows, cols = greedy_topk_pairs(sim, k)  # selection order
            p_sel = gather_tokens(x_path, rows)  # [B, k, D]
            o_sel = gather_tokens(x_omic, cols)
            ks = TorchLinear(d, name="linear_p")(p_sel) + TorchLinear(
                d, name="linear_o"
            )(o_sel)
            remaining_p = remove_indices_keep_order(x_path, rows)
            remaining_o = remove_indices_keep_order(x_omic, cols)
            x = jnp.concatenate([ks, remaining_p, bottle_b, remaining_o], axis=1)

        for i in range(2):
            x = Block(dim=d, name=f"encoders_{i}")(x, deterministic=deterministic)

        t_path = x[:, :1, :]
        f_path = x[:, 1:path_len, :]
        t_omic = x[:, path_len + token_len : path_len + token_len + 1, :]
        f_omic = x[:, path_len + token_len + 1 :, :]
        return t_path, f_path, t_omic, f_omic


class Generator(nn.Module):
    """CycleGAN generator MLP: flatten -> 1024 -> ReLU -> out -> Softplus
    (reference ``umeml_gan.py:25-45``)."""

    tokens: int
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        h = x.reshape(b, -1)
        h = nn.relu(TorchLinear(1024, name="fc1")(h))
        h = jax.nn.softplus(TorchLinear(self.tokens * self.dim, name="fc2")(h))
        return h.reshape(b, self.tokens, self.dim)


class Discriminator(nn.Module):
    """flatten -> 256 -> ReLU -> 1 -> Sigmoid (reference ``umeml_gan.py:48-62``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.reshape(x.shape[0], -1)
        h = nn.relu(TorchLinear(256, name="fc1")(h))
        return jax.nn.sigmoid(TorchLinear(1, name="fc2")(h))


def transform_importance(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample min-max to [0.5, 1.0] (reference ``umeml_gan.py:689-694``)."""
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    return 0.5 + 0.5 * (x - mn) / (mx - mn + 1e-8)


def transform_importance_to_half_one_point_five(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample min-max to [0.5, 1.5] (reference ``umeml_gan.py:696-702``)."""
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    return 0.5 + (x - mn) / (mx - mn + 1e-8)
