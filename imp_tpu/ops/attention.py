"""Attention ops — the kernel layer.

TPU-native re-design of the reference's attention stack
(``medmm/modeling/ops/attention.py``):

* :class:`MultiheadAttention` — batch-first MHA that can return the
  **raw (pre-softmax) attention scores** for co-attention interpretability
  (reference ``multi_head_attention_forward:236-547``, ``need_raw`` path at
  ``:526-541``).  Masks are *valid=True* booleans (the reference uses
  torch's inverted ``key_padding_mask``; we invert at the boundary).
* :class:`NystromAttention` / :class:`Nystromformer` / :class:`TransLayer` —
  linear-complexity landmark attention with iterative Moore-Penrose
  pseudo-inverse (reference ``attention.py:46-231``, pinv at
  ``ops/utils.py:116-131``), extended with first-class mask support so that
  fixed-shape padded bags replace the reference's variable-length bags.

Everything is matmul-shaped and fuses well under XLA; the landmark reduce,
the three similarity einsums and the 6 pinv iterations all hit the MXU.
Computation is performed in float32 (params may be bf16 under the precision
policy; ``preferred_element_type`` keeps MXU accumulation fp32).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# torch-compatible initializers (for statistical parity with the reference)
# ---------------------------------------------------------------------------

# torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
xavier_uniform = nn.initializers.xavier_uniform()


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _distributed_softmax_attention(q, k, v, key_valid, scale, axis_name):
    """Softmax attention with keys sharded over ``axis_name``: local scores,
    global pmax for stability, psum of numerator/denominator. Exact up to
    fp reordering vs the dense single-device path."""
    s = jnp.einsum(
        "bhld,bhsd->bhls", q * scale, k, preferred_element_type=jnp.float32
    )
    raw = s
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, -jnp.finfo(s.dtype).max)
    # stop_gradient BEFORE pmax (no differentiation rule; the max shift is
    # gradient-neutral in softmax)
    m = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(s, axis=-1)), axis_name
    )  # [B, H, L]
    p = jnp.exp(s - m[..., None])
    if key_valid is not None:
        p = p * key_valid[:, None, None, :]
    num = jax.lax.psum(
        jnp.einsum("bhls,bhsd->bhld", p, v, preferred_element_type=jnp.float32),
        axis_name,
    )
    den = jax.lax.psum(p.sum(axis=-1), axis_name)
    out = (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)
    return out, raw


class TorchLinear(nn.Module):
    """Dense layer with torch's default initialization."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


# ---------------------------------------------------------------------------
# functional pieces
# ---------------------------------------------------------------------------

def masked_fill_neg(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Fill invalid positions with -finfo.max (reference uses the same value,
    ``attention.py:134``)."""
    neg = -jnp.finfo(scores.dtype).max
    return jnp.where(valid, scores, neg)


# pinv backend: "xla" (default) = the unrolled jnp chain; "pallas" = the
# fused Newton-Schulz kernel (ops/pinv_kernel.py, one program per matrix
# instead of ~70 small thunks).  The kernel is parity-validated
# (tools/bench_pinv.py --check: fwd bit-exact, grad 2e-7) but measured a
# +1.2 ms/step REGRESSION embedded in the flagship train step
# (interleaved A/B, BASELINE.md r3) — per-program launch + HIGHEST-
# precision serialization beats the thunk chain it replaces at m=128.
# Kept as an opt-in for larger-m / higher-batch regimes.
PINV_MODE = "xla"


def moore_penrose_pinv(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Iterative Moore-Penrose pseudo-inverse (reference ``ops/utils.py:116-131``).

    Note the reference normalizes by the *global* max over all batch/head
    dims (``torch.max`` with no dim); reproduced faithfully.
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)  # Newton-Schulz diverges in bf16

    m = x.shape[-1]
    if (
        PINV_MODE == "pallas"
        and x.ndim >= 2
        and x.shape[-2] == m
        and m % 128 == 0
        and m <= 512
        and jax.default_backend() == "tpu"
    ):
        from .pinv_kernel import pinv_newton_schulz

        return pinv_newton_schulz(x, iters).astype(in_dtype)

    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)

    # the Newton-Schulz iteration is numerics-sensitive: force true-fp32 MXU
    # passes (TPU fp32 matmul otherwise defaults to bf16 passes).
    # The fixed 6-step loop is UNROLLED: a lax.fori_loop here shows up as a
    # device `while` with ~60-200 us launch/sync overhead per Nystrom layer
    # (the [.., m, m] matmuls themselves are a few us) — unrolling lets XLA
    # fuse/pipeline the chain and removes that overhead from every TransLayer.
    for _ in range(iters):
        with jax.default_matmul_precision("highest"):
            xz = x @ z
            z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))

    return z.astype(in_dtype)


def res_conv_param(module, h: int, ksz: int) -> jnp.ndarray:
    """The ``res_conv`` depthwise token-conv filter, one per head (reference
    ``Conv2d(heads, heads, (k,1), groups=heads, bias=False)``; torch default
    init uniform(±1/sqrt(fan_in)) with fan_in = in_channels/groups·kh·kw =
    ksz).  One definition shared by the Nyström, flash, and sequence-parallel
    attention paths so the parameter name/shape/init — and therefore
    checkpoint interchangeability between the paths — cannot drift."""
    fan_in = ksz
    return module.param(
        "res_conv",
        lambda key, shape: jax.random.uniform(
            key, shape, jnp.float32, -1.0 / math.sqrt(fan_in), 1.0 / math.sqrt(fan_in)
        ),
        (h, 1, ksz, 1),
    )


def residual_depthwise_conv(
    v: jnp.ndarray, w: jnp.ndarray, token_padding: str = "same"
) -> jnp.ndarray:
    """Per-head depthwise conv over the token axis (the Nyström value
    residual, reference ``Conv2d(heads, heads, (k,1), groups=heads)``).

    v: [B, H, N, dh]; w: [H, 1, k, 1].  Computed in NHWC layout with
    channels = H·dh (the per-head filter broadcast over dh): TPU lowers
    an 8-channel NCHW depthwise conv ~2.6x slower than the 256-channel
    channels-minor form (measured; the conv is pure overhead otherwise —
    ~170 MFLOP on a 10k-token bag).  ``token_padding='valid'`` is used by
    the halo variant (the caller supplies the k//2 boundary tokens)."""
    b, h, n, dh = v.shape
    k = w.shape[2]
    x = jnp.transpose(v, (0, 2, 3, 1)).reshape(b, n, 1, dh * h)
    # channel c = d*h + head  ->  filter w[head]
    w2 = jnp.tile(
        w[:, 0, :, 0].T[:, None, None, :], (1, 1, 1, dh)
    ).reshape(k, 1, 1, dh * h)
    pad = (k // 2, k // 2) if token_padding == "same" else (0, 0)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w2.astype(jnp.float32),
        window_strides=(1, 1),
        padding=(pad, (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=dh * h,
    )
    nout = y.shape[1]
    return jnp.transpose(y.reshape(b, nout, dh, h), (0, 3, 1, 2)).astype(v.dtype)


def halo_depthwise_conv(
    v_band: jnp.ndarray,  # [B, H, nb, dh] this device's token band
    w: jnp.ndarray,  # [H, 1, k, 1]
    axis_name: str,
    left_extra: Optional[jnp.ndarray] = None,  # [B, H, 1, dh] replicated cls
):
    """:func:`residual_depthwise_conv` over a sequence-SHARDED value array
    without gathering it: k//2-token halos exchange with ring neighbors via
    ``ppermute`` (O(k) comms, O(N/sp) memory) and the conv runs VALID on the
    haloed band — numerics identical to the SAME-padded conv over the global
    sequence ``[left_extra?; band_0; …; band_{sp-1}]``.

    ``left_extra`` is an optional replicated token (the TransMIL cls) that
    sits immediately before band 0 in the global sequence; when given, its
    own conv output (computable only where the first band lives) is
    psum-broadcast and returned as the second element."""
    from jax import lax

    b, h, nb, dh = v_band.shape
    k = w.shape[2]
    r = k // 2
    if nb < r:
        raise ValueError(
            f"halo conv needs band >= k//2 tokens ({nb} < {r}); lower the "
            f"seq-axis size or use the gather path (TPU.SP_ATTENTION=gather)"
        )
    sp = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    # device d's left halo = last r tokens of band d-1 (device 0: zeros =
    # the SAME zero padding, with the cls token spliced in when present)
    left = lax.ppermute(
        v_band[:, :, -r:], axis_name, [(i, i + 1) for i in range(sp - 1)]
    )
    if left_extra is not None:
        dev0_left = jnp.concatenate(
            [jnp.zeros_like(left[:, :, : r - 1]), left_extra.astype(left.dtype)],
            axis=2,
        )
        left = jnp.where(me == 0, dev0_left, left)
    right = lax.ppermute(
        v_band[:, :, :r], axis_name, [(i, i - 1) for i in range(1, sp)]
    )
    seq = jnp.concatenate([left, v_band, right], axis=2)
    band_out = residual_depthwise_conv(seq, w, token_padding="valid")
    cls_out = None
    if left_extra is not None:
        cseq = jnp.concatenate(
            [
                jnp.zeros_like(v_band[:, :, :r]),
                left_extra.astype(v_band.dtype),
                v_band[:, :, :r],
            ],
            axis=2,
        )
        c = residual_depthwise_conv(cseq, w, token_padding="valid")
        cls_out = lax.psum(
            jnp.where(me == 0, c, jnp.zeros_like(c)), axis_name
        )
    return band_out, cls_out


def dense_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plain masked dense attention.

    q: [B,H,L,dh], k/v: [B,H,S,dh], key_valid: [B,S] bool (True = attend).
    Returns (out [B,H,L,dh], weights [B,H,L,S], raw scores [B,H,L,S]).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhld,bhsd->bhls", q * scale, k)
    if key_valid is not None:
        scores = masked_fill_neg(scores, key_valid[:, None, None, :])
    raw = scores
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", weights, v)
    return out, weights, raw


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class MultiheadAttention(nn.Module):
    """Batch-first MHA with optional raw-score output.

    Equivalent to reference ``ops/blocks.py:346-527`` + the forked
    ``multi_head_attention_forward`` (``ops/attention.py:236-547``): packed
    qkv projection (xavier-uniform init, zero bias), output projection
    (torch Linear default init), softmax-dropout, and the ``need_raw``
    interpretability path that returns pre-softmax scores per head.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    # sequence parallelism: when set (and running under shard_map), key /
    # value arrive as [B, S/sp, E] token shards and the softmax normalizes
    # over the GLOBAL key axis via pmax/psum collectives
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, L, E]
        key: jnp.ndarray,  # [B, S, E] (local shard when seq_axis is set)
        value: jnp.ndarray,  # [B, S, E]
        key_valid: Optional[jnp.ndarray] = None,  # [B, S] bool, True = attend
        need_raw: bool = True,
        deterministic: bool = True,
    ):
        e, h = self.embed_dim, self.num_heads
        dh = e // h
        assert dh * h == e, "embed_dim must be divisible by num_heads"
        in_proj_w = self.param("in_proj_weight", xavier_uniform, (e, 3 * e))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        proj = jnp.einsum("...d,de->...e", query, in_proj_w[:, :e]) + in_proj_b[:e]
        q = proj
        # k/v inherit the key/value dtype (a no-op at fp32): under the
        # bag-bf16 policy (umeml_gan.BAG_DTYPE) the bag-sized K/V buffers
        # stay half-width instead of being silently promoted by the fp32
        # projection weights
        k = (
            jnp.einsum("...d,de->...e", key, in_proj_w[:, e : 2 * e])
            + in_proj_b[e : 2 * e]
        ).astype(key.dtype)
        v = (
            jnp.einsum("...d,de->...e", value, in_proj_w[:, 2 * e :])
            + in_proj_b[2 * e :]
        ).astype(value.dtype)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if self.seq_axis is not None:
            assert self.dropout == 0.0 or deterministic, (
                "attention-weight dropout is not supported under sequence "
                "parallelism (the weight matrix never exists globally)"
            )
            out, raw = _distributed_softmax_attention(
                q, k, v, key_valid, dh**-0.5, self.seq_axis
            )
            b, _, l, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, l, e)
            out = TorchLinear(e, name="out_proj")(out)
            # raw scores are shard-local ([B, H, L, S/sp]); weights-mean is
            # not offered under sp (callers use need_raw)
            return out, raw
        out, weights, raw = dense_attention(q, k, v, key_valid, scale=dh**-0.5)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
            out = jnp.einsum("bhls,bhsd->bhld", weights, v)
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, e)
        out = TorchLinear(e, name="out_proj")(out)
        if need_raw:
            return out, raw  # [B, H, L, S]
        return out, weights.mean(axis=1)  # averaged over heads


class NystromAttention(nn.Module):
    """Nyström linear attention over (optionally masked) token sequences.

    Faithful to reference ``ops/attention.py:46-161``: front-pad to a
    multiple of the landmark count, landmark sums with (masked) mean, three
    similarity softmaxes, 6-iteration Moore-Penrose pinv of the landmark
    Gram matrix, and a depthwise-conv value residual.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    eps: float = 1e-8
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, D]
        mask: Optional[jnp.ndarray] = None,  # [B, N] bool, True = valid
        return_attn: bool = False,
        deterministic: bool = True,
    ):
        b, n, _ = x.shape
        h, m, iters, eps = self.heads, self.num_landmarks, self.pinv_iterations, self.eps
        inner = h * self.dim_head

        # pad front so the sequence divides into m landmark groups
        remainder = n % m
        padding = (m - remainder) % m
        if padding > 0:
            x = jnp.pad(x, ((0, 0), (padding, 0), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (padding, 0)), constant_values=False)
        n_pad = n + padding

        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n_pad, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        if mask is not None:
            mvalid = mask[:, None, :, None]  # [B,1,N,1]
            q = q * mvalid
            k = k * mvalid
            v = v * mvalid

        q = q * (self.dim_head**-0.5)

        # landmarks: m groups of l consecutive tokens, summed then mean'd
        l = n_pad // m
        if l == 1 and mask is None:
            # Short-sequence fast path (the UMEML head: n<=17 tokens front-
            # padded to m=128, so every landmark group is a single token and
            # the divisor is exactly 1.0): q_l == q and k_l == k bit-for-bit,
            # hence the reference's three similarity matrices
            # (attention.py:118-124 in the reference) are one and the same
            # matrix. Compute ONE sim + ONE softmax and reuse — identical
            # arithmetic, one third of the score-stage kernels.
            sim1 = jnp.einsum("bhid,bhjd->bhij", q, k)
            attn1 = attn2 = attn3 = jax.nn.softmax(sim1, axis=-1)
        else:
            q_l = q.reshape(b, h, m, l, self.dim_head).sum(axis=3)
            k_l = k.reshape(b, h, m, l, self.dim_head).sum(axis=3)

            if mask is not None:
                mask_l_sum = mask.reshape(b, 1, m, l).sum(axis=3)  # [B,1,m]
                divisor = mask_l_sum[..., None] + eps
                mask_l = mask_l_sum > 0
            else:
                divisor = float(l)
                mask_l = None
            q_l = q_l / divisor
            k_l = k_l / divisor

            sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)
            sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
            sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)

            if mask is not None:
                sim1 = masked_fill_neg(
                    sim1, mask[:, None, :, None] & mask_l[..., None, :]
                )
                sim2 = masked_fill_neg(sim2, mask_l[..., None] & mask_l[..., None, :])
                sim3 = masked_fill_neg(
                    sim3, mask_l[..., None] & mask[:, None, None, :]
                )

            attn1 = jax.nn.softmax(sim1, axis=-1)
            attn2 = jax.nn.softmax(sim2, axis=-1)
            attn3 = jax.nn.softmax(sim3, axis=-1)
        attn2_inv = moore_penrose_pinv(attn2, iters)

        out = (attn1 @ attn2_inv) @ (attn3 @ v)

        if self.residual:
            w = res_conv_param(self, h, self.residual_conv_kernel)
            res = residual_depthwise_conv(v, w).astype(out.dtype)
            out = out + res

        out = out.transpose(0, 2, 1, 3).reshape(b, n_pad, inner)
        out = TorchLinear(self.dim, name="to_out")(out)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        out = out[:, -n:]

        if return_attn:
            attn = attn1 @ attn2_inv @ attn3
            return out, attn
        return out


class PreNorm(nn.Module):
    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        return self.fn(nn.LayerNorm(epsilon=1e-5)(x), **kwargs)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchLinear(self.dim * self.mult)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        return TorchLinear(self.dim)(x)


class Nystromformer(nn.Module):
    """Depth-stacked PreNorm(NystromAttention)+PreNorm(FF)
    (reference ``attention.py:187-231``)."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    attn_values_residual: bool = True
    attn_values_residual_conv_kernel: int = 33
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        for _ in range(self.depth):
            attn = PreNorm(
                NystromAttention(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    num_landmarks=self.num_landmarks,
                    pinv_iterations=self.pinv_iterations,
                    residual=self.attn_values_residual,
                    residual_conv_kernel=self.attn_values_residual_conv_kernel,
                    dropout=self.attn_dropout,
                )
            )
            ff = PreNorm(FeedForward(dim=self.dim, dropout=self.ff_dropout))
            x = attn(x, mask=mask, deterministic=deterministic) + x
            x = ff(x, deterministic=deterministic) + x
        return x


# process-wide default attention implementation for TransLayer, set from
# cfg.TPU.ATTENTION by the trainer ("nystrom" = reference parity;
# "flash" = exact masked attention via the Pallas kernel)
_DEFAULT_ATTENTION_IMPL = "nystrom"


def set_default_attention_impl(name: str) -> None:
    global _DEFAULT_ATTENTION_IMPL
    assert name in ("nystrom", "flash"), name
    _DEFAULT_ATTENTION_IMPL = name


def _band_bounds(ntok: int, axis_name: str):
    """Equal per-device band partition of a token axis of length ``ntok``
    under mesh axis ``axis_name``: (band_size, padded_length)."""
    spn = jax.lax.axis_size(axis_name)
    band = -(-ntok // spn)
    return band, band * spn


def gather_tokens_replicated(band, axis_name, axis: int = 1):
    """All-gather per-device token bands into the full array, PROVABLY
    replicated over ``axis_name``: each device scatters its band into a
    zero buffer at its offset and the buffers psum — shard_map's
    replication checker accepts psum outputs where a plain ``all_gather``
    (same values, unprovable) is rejected at ``out_specs=P()``."""
    from jax import lax

    spn = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    bsz = band.shape[axis]
    shape = list(band.shape)
    shape[axis] = bsz * spn
    if band.dtype == jnp.bool_:
        return (
            gather_tokens_replicated(
                band.astype(jnp.float32), axis_name, axis
            )
            > 0.5
        )
    buf = lax.dynamic_update_slice_in_dim(
        jnp.zeros(shape, band.dtype), band, me * bsz, axis=axis
    )
    return lax.psum(buf, axis_name)


class ExactSelfAttention(nn.Module):
    """Exact masked self-attention with the same parameter structure as
    :class:`NystromAttention` (to_qkv / res_conv / to_out), computed by the
    Pallas flash kernel on TPU — checkpoint-interchangeable with Nyström.

    ``seq_axis``: sequence-parallel mode for TransLayer-family models under
    shard_map.  Two layouts, selected by ``sp_mode``:

    * ``"gather"`` (default): the INPUT is the full (seq-replicated) token
      array; each device projects and attends only its own query band (1/sp
      of the O(N²) work and of the qkv/out projections), K/V bands
      all-gather over ICI, and the output bands gather back to the full
      array.  Per-device memory is O(N).
    * ``"ring"``: shard-in/shard-out — the INPUT is this device's token
      band ``[B, N/sp, D]`` and the output stays a band; K/V chunks rotate
      via :func:`...ring_self_attention` (``ppermute``) and the residual
      depthwise conv runs with k//2-token halo exchanges — **nothing of
      size N ever materializes on one device** (the 100k-patch-bag layout).
      An optional replicated ``cls`` token rides along: its K/V enter the
      ring exactly once (masked slot owned by device 0) and every device
      computes the identical cls query row.

    Numerics match the single-device exact path (same per-row
    online-softmax sweep order; the ring cls row differs only by the
    logsumexp merge order, broadcast from device 0 by the caller)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    residual: bool = True
    residual_conv_kernel: int = 33
    dropout: float = 0.0
    seq_axis: object = None  # Optional[str]
    sp_mode: str = "gather"  # "gather" | "ring"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 has_cls: bool = False):
        from .flash_attention import flash_attention

        b, n, _ = x.shape
        h = self.heads
        inner = h * self.dim_head

        if self.seq_axis is not None:
            if self.sp_mode == "ring":
                return self._ring_forward(x, mask, deterministic, has_cls)
            return self._sp_forward(x, mask, deterministic)

        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        if mask is not None:
            mvalid = mask[:, None, :, None]
            v = v * mvalid
        out = flash_attention(q, k, v, mask=mask, scale=self.dim_head**-0.5)

        if self.residual:
            w = res_conv_param(self, h, self.residual_conv_kernel)
            res = residual_depthwise_conv(v, w).astype(out.dtype)
            out = out + res

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = TorchLinear(self.dim, name="to_out")(out)
        return nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)

    def _sp_forward(self, x, mask, deterministic):
        """Sequence-parallel body: query-band attention with all-gather-KV.
        Same parameter names/shapes as the single-device path."""
        from jax import lax

        from .flash_attention import flash_attention

        b, n, _ = x.shape
        h, inner = self.heads, self.heads * self.dim_head
        ax = self.seq_axis
        band, npad = _band_bounds(n, ax)
        me = lax.axis_index(ax)
        xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
        if mask is None:
            mask = jnp.ones((b, n), bool)
        mp = jnp.pad(mask, ((0, 0), (0, npad - n)))
        x_band = lax.dynamic_slice_in_dim(xp, me * band, band, axis=1)
        m_band = lax.dynamic_slice_in_dim(mp, me * band, band, axis=1)

        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x_band)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, band, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        v = v * m_band[:, None, :, None]
        k_full = lax.all_gather(k, ax, axis=2, tiled=True)
        v_full = lax.all_gather(v, ax, axis=2, tiled=True)
        out = flash_attention(
            q, k_full, v_full, mask=mp, scale=self.dim_head**-0.5
        )

        if self.residual:
            w = res_conv_param(self, h, self.residual_conv_kernel)
            # depthwise token conv needs +-16 neighbor tokens: run it on the
            # gathered full v (pad tokens are zero, so the band boundaries
            # see exactly the single-device SAME-padding values) and slice
            # this device's band back out — O(N·k) replicated compute
            res_full = residual_depthwise_conv(v_full, w).astype(out.dtype)
            out = out + lax.dynamic_slice_in_dim(res_full, me * band, band, axis=2)

        out = out.transpose(0, 2, 1, 3).reshape(b, band, inner)
        out = TorchLinear(self.dim, name="to_out")(out)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.dropout)(
                out,
                deterministic=False,
                rng=jax.random.fold_in(self.make_rng("dropout"), me),
            )
        return gather_tokens_replicated(out, ax, axis=1)[:, :n]

    def _ring_forward(self, x, mask, deterministic, has_cls):
        """Shard-in/shard-out body: ``x`` is ``[cls?; band]`` local tokens
        ([B, nb(+1), D]); K/V rotate around the ring, the residual conv uses
        halo exchanges, and the output keeps the band layout.  Same
        parameter names/shapes as the single-device path (checkpoints
        interchange)."""
        from jax import lax

        from ..parallel.sequence import ring_self_attention

        b, nc, _ = x.shape
        h, inner = self.heads, self.heads * self.dim_head
        ax = self.seq_axis
        me = lax.axis_index(ax)
        nb = nc - 1 if has_cls else nc
        if mask is None:
            mask = jnp.ones((b, nb), bool)

        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, nc, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        if has_cls:
            # the cls K/V slot participates exactly once globally: only
            # device 0's copy is valid in the ring
            m_chunk = jnp.concatenate(
                [jnp.broadcast_to(me == 0, (b, 1)), mask], axis=1
            )
        else:
            m_chunk = mask
        v_raw = v
        v = v * m_chunk[:, None, :, None]
        out = ring_self_attention(
            q, k, v, m_chunk, scale=self.dim_head**-0.5, axis_name=ax
        )

        if self.residual:
            w = res_conv_param(self, h, self.residual_conv_kernel)
            if has_cls:
                band_res, cls_res = halo_depthwise_conv(
                    v[:, :, 1:], w, ax, left_extra=v_raw[:, :, :1]
                )
                out = out + jnp.concatenate([cls_res, band_res], axis=2).astype(
                    out.dtype
                )
            else:
                band_res, _ = halo_depthwise_conv(v, w, ax)
                out = out + band_res.astype(out.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, nc, inner)
        out = TorchLinear(self.dim, name="to_out")(out)
        if self.dropout > 0.0 and not deterministic:
            base = self.make_rng("dropout")
            band_drop = nn.Dropout(rate=self.dropout)(
                out[:, 1:] if has_cls else out,
                deterministic=False,
                rng=jax.random.fold_in(base, me + 1),
            )
            if has_cls:
                # the cls row must draw the SAME mask on every device to
                # stay replicated
                cls_drop = nn.Dropout(rate=self.dropout)(
                    out[:, :1], deterministic=False, rng=base
                )
                out = jnp.concatenate([cls_drop, band_drop], axis=1)
            else:
                out = band_drop
        return out


class TransLayer(nn.Module):
    """``x + Attention(LN(x))`` with heads=8, dim_head=dim/8 — the standard
    block used by TransMIL / CMTA / UMEML (reference ``ops/blocks.py:252-268``),
    plus mask support.  ``impl='auto'`` follows the process default
    (cfg.TPU.ATTENTION): Nyström (landmarks=dim/2, reference parity) or the
    exact Pallas flash attention."""

    dim: int = 512
    dropout: float = 0.1
    impl: str = "auto"
    # sequence parallelism: with sp_mode="gather" tokens stay seq-replicated
    # in/out (the attention runs query-banded with all-gather-KV,
    # ExactSelfAttention._sp_forward); with sp_mode="ring"
    # (TPU.SP_ATTENTION=ring) the layer is SHARD-IN/SHARD-OUT — ``x`` is
    # this device's [B, N/sp, D] token band (``mask`` the band mask), an
    # optional replicated ``cls`` token threads separately, and the call
    # returns ``(band, cls)`` with O(N/sp) per-device activations.
    # Nyström's landmark pooling doesn't decompose over shards, so a seq
    # axis always uses the EXACT kernel (documented deviation: exact ≥
    # approximate; the non-sp path keeps reference-parity Nyström).
    seq_axis: object = None  # Optional[str]
    sp_mode: str = "gather"  # "gather" | "ring"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, cls=None):
        impl = self.impl if self.impl != "auto" else _DEFAULT_ATTENTION_IMPL
        if cls is not None and not (
            self.seq_axis is not None and self.sp_mode == "ring"
        ):
            raise ValueError("cls threading is a ring-mode (sp_mode='ring') "
                             "contract; prepend it to x otherwise")
        if self.seq_axis is not None and self.sp_mode == "ring":
            xin = x if cls is None else jnp.concatenate([cls, x], axis=1)
            y = nn.LayerNorm(epsilon=1e-5)(xin)
            y = ExactSelfAttention(
                dim=self.dim,
                dim_head=self.dim // 8,
                heads=8,
                residual=True,
                dropout=self.dropout,
                seq_axis=self.seq_axis,
                sp_mode="ring",
                name="attn",
            )(y, mask=mask, deterministic=deterministic,
              has_cls=cls is not None)
            out = xin + y
            if cls is None:
                return out
            return out[:, 1:], out[:, :1]
        y = nn.LayerNorm(epsilon=1e-5)(x)
        if self.seq_axis is not None:
            y = ExactSelfAttention(
                dim=self.dim,
                dim_head=self.dim // 8,
                heads=8,
                residual=True,
                dropout=self.dropout,
                seq_axis=self.seq_axis,
                name="attn",
            )(y, mask=mask, deterministic=deterministic)
            return x + y
        if impl == "flash":
            y = ExactSelfAttention(
                dim=self.dim,
                dim_head=self.dim // 8,
                heads=8,
                residual=True,
                dropout=self.dropout,
                name="attn",
            )(y, mask=mask, deterministic=deterministic)
        else:
            y = NystromAttention(
                dim=self.dim,
                dim_head=self.dim // 8,
                heads=8,
                num_landmarks=self.dim // 2,
                pinv_iterations=6,
                residual=True,
                dropout=self.dropout,
                name="attn",
            )(y, mask=mask, deterministic=deterministic)
        return x + y
