"""Shared NN blocks (reference ``medmm/modeling/ops/blocks.py``), as flax
modules over fixed-shape masked inputs.

Reference quirks fixed by spec: the hardcoded ``.cuda()`` in
Transformer_P/G (``blocks.py:308,334``) and ``torch.cuda.FloatTensor`` in
BilinearFusion (``blocks.py:176-177``) simply disappear (device placement is
XLA's job); the duplicated TransLayer/PPEG definitions (``blocks.py:252/530``)
exist once.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import TorchLinear, TransLayer, masked_fill_neg


class AlphaDropout(nn.Module):
    """Self-normalizing dropout (torch ``nn.AlphaDropout``)."""

    rate: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        alpha_p = -1.7580993408473766
        p, q = self.rate, 1.0 - self.rate
        a = (q + alpha_p**2 * p * q) ** -0.5
        b = -a * alpha_p * p
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, q, x.shape)
        return a * jnp.where(keep, x, alpha_p) + b


class SNN_Block(nn.Module):
    """Linear + ELU + AlphaDropout (reference ``blocks.py:15-27``)."""

    dim2: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchLinear(self.dim2)(x)
        x = nn.elu(x)
        return AlphaDropout(self.dropout)(x, deterministic=deterministic)


class Reg_Block(nn.Module):
    """Linear + ReLU + Dropout (reference ``blocks.py:29-42``)."""

    dim2: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchLinear(self.dim2)(x)
        x = nn.relu(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


MLP_Block = Reg_Block  # reference ``blocks.py:44-48`` is identical


class Attn_Net(nn.Module):
    """ABMIL attention scorer (reference ``blocks.py:50-65``)."""

    D: int = 256
    dropout: bool = False
    n_classes: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a = jnp.tanh(TorchLinear(self.D)(x))
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
        return TorchLinear(self.n_classes)(a), x


class Attn_Net_Gated(nn.Module):
    """Gated ABMIL attention scorer: tanh ⊙ sigmoid -> linear score
    (reference ``blocks.py:67-97``)."""

    D: int = 256
    dropout: bool = False
    n_classes: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        a = jnp.tanh(TorchLinear(self.D, name="attention_a")(x))
        b = jax.nn.sigmoid(TorchLinear(self.D, name="attention_b")(x))
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
            b = nn.Dropout(0.25)(b, deterministic=deterministic)
        A = TorchLinear(self.n_classes, name="attention_c")(a * b)
        return A, x


def masked_attention_pool(
    scores: jnp.ndarray,  # [B, N, C] pre-softmax scores
    feats: jnp.ndarray,  # [B, N, D]
    valid: Optional[jnp.ndarray] = None,  # [B, N] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """softmax(scores) over N (masked) then weighted sum of feats.

    Returns (pooled [B, C, D], weights [B, C, N]).
    """
    s = jnp.swapaxes(scores, -1, -2)  # [B, C, N]
    if valid is not None:
        s = masked_fill_neg(s, valid[:, None, :])
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bcn,bnd->bcd", w, feats), w


class BilinearFusion(nn.Module):
    """Kronecker (outer-product) gated fusion with appended ones
    (reference ``blocks.py:102-184``)."""

    skip: int = 0
    use_bilinear: int = 0
    gate1: int = 1
    gate2: int = 1
    dim1: int = 128
    dim2: int = 128
    scale_dim1: int = 1
    scale_dim2: int = 1
    mmhid: int = 256
    dropout_rate: float = 0.25

    @nn.compact
    def __call__(self, vec1, vec2, deterministic: bool = True):
        dim1 = self.dim1 // self.scale_dim1
        dim2 = self.dim2 // self.scale_dim2
        drop = lambda x: nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        h1 = nn.relu(TorchLinear(dim1, name="linear_h1")(vec1))
        if self.gate1:
            z1 = TorchLinear(dim1, name="linear_z1")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o1 = jax.nn.sigmoid(z1) * h1
        else:
            o1 = h1
        o1 = drop(nn.relu(TorchLinear(dim1, name="linear_o1")(o1)))

        h2 = nn.relu(TorchLinear(dim2, name="linear_h2")(vec2))
        if self.gate2:
            z2 = TorchLinear(dim2, name="linear_z2")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o2 = jax.nn.sigmoid(z2) * h2
        else:
            o2 = h2
        o2 = drop(nn.relu(TorchLinear(dim2, name="linear_o2")(o2)))

        ones = jnp.ones((o1.shape[0], 1), dtype=o1.dtype)
        o1 = jnp.concatenate([o1, ones], axis=1)
        o2 = jnp.concatenate([o2, ones], axis=1)
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
        out = drop(o12)
        out = drop(nn.relu(TorchLinear(256, name="encoder1")(out)))
        if self.skip:
            out = jnp.concatenate([out, vec1, vec2], axis=1)
        out = drop(nn.relu(TorchLinear(self.mmhid, name="encoder2")(out)))
        return out


class LRBilinearFusion(nn.Module):
    """Low-rank bilinear fusion (reference ``blocks.py:187-249``)."""

    skip: int = 0
    gate1: int = 1
    gate2: int = 1
    dim1: int = 128
    dim2: int = 128
    scale_dim1: int = 1
    scale_dim2: int = 1
    dropout_rate: float = 0.25
    rank: int = 16
    output_dim: int = 4

    @nn.compact
    def __call__(self, vec1, vec2, deterministic: bool = True):
        dim1 = self.dim1 // self.scale_dim1
        dim2 = self.dim2 // self.scale_dim2
        drop = lambda x: nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        h1 = nn.relu(TorchLinear(dim1, name="linear_h1")(vec1))
        if self.gate1:
            z1 = TorchLinear(dim1, name="linear_z1")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o1 = drop(nn.relu(TorchLinear(dim1, name="linear_o1")(jax.nn.sigmoid(z1) * h1)))
        else:
            o1 = drop(nn.relu(TorchLinear(dim1, name="linear_o1")(h1)))

        h2 = nn.relu(TorchLinear(dim2, name="linear_h2")(vec2))
        if self.gate2:
            z2 = TorchLinear(dim2, name="linear_z2")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o2 = drop(nn.relu(TorchLinear(dim2, name="linear_o2")(jax.nn.sigmoid(z2) * h2)))
        else:
            o2 = drop(nn.relu(TorchLinear(dim2, name="linear_o2")(h2)))

        xavier_normal = nn.initializers.xavier_normal()
        h1_factor = self.param("h1_factor", xavier_normal, (self.rank, dim1 + 1, self.output_dim))
        h2_factor = self.param("h2_factor", xavier_normal, (self.rank, dim2 + 1, self.output_dim))
        fusion_weights = self.param("fusion_weights", xavier_normal, (1, self.rank))
        fusion_bias = self.param("fusion_bias", nn.initializers.zeros, (1, self.output_dim))

        ones = jnp.ones((o1.shape[0], 1), dtype=o1.dtype)
        _o1 = jnp.concatenate([ones, o1], axis=1)
        _o2 = jnp.concatenate([ones, o2], axis=1)
        o1_fusion = jnp.einsum("bd,rdo->rbo", _o1, h1_factor)
        o2_fusion = jnp.einsum("bd,rdo->rbo", _o2, h2_factor)
        fusion_zy = o1_fusion * o2_fusion  # [rank, B, out]
        output = jnp.einsum("xr,rbo->bo", fusion_weights, fusion_zy) + fusion_bias
        return output


class PPEG(nn.Module):
    """Pyramid positional encoding: 7/5/3 depthwise convs over the token
    grid, cls token excluded (reference ``blocks.py:271-285``).

    ``seq_axis``: shard-in/shard-out mode (the ``TPU.SP_ATTENTION=ring``
    layout) — ``x`` is this device's band of GRID tokens (no cls;
    ``H/sp`` contiguous grid rows, ``[B, H·W/sp, C]``); 3-row halos
    exchange with ring neighbors via ``ppermute`` and the convs run VALID
    on the haloed slab — numerics identical to the SAME-padded convs over
    the full grid, with O(H·W/sp) per-device memory."""

    dim: int = 512
    seq_axis: object = None  # Optional[str]

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, _, C = x.shape
        if self.seq_axis is None:
            cls_token, feat = x[:, :1], x[:, 1:]
            grid = feat.transpose(0, 2, 1).reshape(B, C, H, W)
        else:
            sp = jax.lax.axis_size(self.seq_axis)
            if H % sp != 0 or H // sp < 3:
                raise ValueError(
                    f"PPEG ring mode needs grid rows divisible by the seq "
                    f"axis with >= 3 rows per device (H={H}, sp={sp})"
                )
            hl = H // sp
            grid = x.transpose(0, 2, 1).reshape(B, C, hl, W)
            # halo rows: device d-1's bottom 3 rows sit ABOVE this band,
            # device d+1's top 3 rows BELOW; edge devices receive zeros
            # (= the convs' SAME zero padding)
            above = jax.lax.ppermute(
                grid[:, :, -3:], self.seq_axis,
                [(i, i + 1) for i in range(sp - 1)],
            )
            below = jax.lax.ppermute(
                grid[:, :, :3], self.seq_axis,
                [(i, i - 1) for i in range(1, sp)],
            )
            slab = jnp.concatenate([above, grid, below], axis=2)
            hloc = hl

        def dwconv(name: str, k: int):
            fan_in = k * k
            bound = 1.0 / math.sqrt(fan_in)
            w = self.param(
                f"{name}_kernel",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (C, 1, k, k),
            )
            bias = self.param(
                f"{name}_bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (C,),
            )
            if self.seq_axis is None:
                src = grid.astype(jnp.float32)
                row_pad = (k // 2, k // 2)
            else:
                r = k // 2
                src = slab[:, :, 3 - r : 3 + hloc + r].astype(jnp.float32)
                row_pad = (0, 0)
            y = jax.lax.conv_general_dilated(
                src,
                w.astype(jnp.float32),
                window_strides=(1, 1),
                padding=(row_pad, (k // 2, k // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C,
            )
            return (y + bias.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)

        out = dwconv("proj", 7) + grid + dwconv("proj1", 5) + dwconv("proj2", 3)
        if self.seq_axis is None:
            out = out.reshape(B, C, H * W).transpose(0, 2, 1)
            return jnp.concatenate([cls_token, out], axis=1)
        out = out.reshape(B, C, (H // jax.lax.axis_size(self.seq_axis)) * W)
        return out.transpose(0, 2, 1)


def square_pad(features: jnp.ndarray, valid: Optional[jnp.ndarray] = None):
    """Pad a bag to a square token grid by repeating its leading tokens
    (reference Transformer_P pad, ``blocks.py:300-305``). Static shapes."""
    n = features.shape[1]
    side = int(math.ceil(math.sqrt(n)))
    add = side * side - n
    if add > 0:
        features = jnp.concatenate([features, features[:, :add]], axis=1)
        if valid is not None:
            valid = jnp.concatenate([valid, valid[:, :add]], axis=1)
    return features, valid, side


class Transformer_P(nn.Module):
    """TransMIL-style pathology encoder: square-pad + cls + TransLayer +
    PPEG + TransLayer (reference ``blocks.py:288-318``), masked."""

    feature_dim: int = 512

    @nn.compact
    def __call__(self, features, valid=None, deterministic: bool = True):
        h, valid_sq, side = square_pad(features, valid)
        B = h.shape[0]
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6), (1, 1, self.feature_dim)
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        vmask = None
        if valid_sq is not None:
            vmask = jnp.concatenate(
                [jnp.ones((B, 1), dtype=bool), valid_sq], axis=1
            )
        h = TransLayer(dim=self.feature_dim, name="layer1")(
            h, mask=vmask, deterministic=deterministic
        )
        h = PPEG(dim=self.feature_dim, name="pos_layer")(h, side, side)
        h = TransLayer(dim=self.feature_dim, name="layer2")(
            h, mask=vmask, deterministic=deterministic
        )
        h = nn.LayerNorm(epsilon=1e-5)(h)
        return h[:, 0], h[:, 1:]


class Transformer_G(nn.Module):
    """Genomics encoder: cls + TransLayer x2 (reference ``blocks.py:321-342``)."""

    feature_dim: int = 512

    @nn.compact
    def __call__(self, features, valid=None, deterministic: bool = True):
        B = features.shape[0]
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6), (1, 1, self.feature_dim)
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), features], axis=1)
        vmask = None
        if valid is not None:
            vmask = jnp.concatenate([jnp.ones((B, 1), dtype=bool), valid], axis=1)
        h = TransLayer(dim=self.feature_dim, name="layer1")(
            h, mask=vmask, deterministic=deterministic
        )
        h = TransLayer(dim=self.feature_dim, name="layer2")(
            h, mask=vmask, deterministic=deterministic
        )
        h = nn.LayerNorm(epsilon=1e-5)(h)
        return h[:, 0], h[:, 1:]
