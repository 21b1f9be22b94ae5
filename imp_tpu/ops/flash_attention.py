"""Masked flash attention as Pallas TPU kernels — forward AND backward.

Exact O(N^2) attention over whole-slide bags with online softmax — offered
as ``TPU.ATTENTION=flash``, an exact alternative to the reference's Nyström
approximation (``medmm/modeling/ops/attention.py:46-161``) that the
10k-token bag envelope (``data_manager.py:387``) makes affordable on TPU.

Forward: canonical 4D grid (batch, head, q-block, kv-block), kv fastest;
per-q-block running max / sum / accumulator live in VMEM scratch and the
output block + row logsumexp are written on the last kv step.

Backward (``jax.custom_vjp``): the standard two-sweep flash backward with
recomputation — residuals are just (q, k, v, bias, O, lse); no [N, N]
matrix ever exists.  With delta = rowsum(dO ⊙ O):

* dq kernel, grid (b, h, qi, ki): P = exp(S − lse), dP = dO Vᵀ,
  dS = P (dP − delta), dq += dS K — accumulated over kv blocks;
* dk/dv kernel, grid (b, h, ki, qi): dv += Pᵀ dO, dk += dSᵀ Q —
  accumulated over q blocks.

The key mask is an additive bias row (0 valid / −1e30 masked): one vadd
per score tile instead of a compare+select.  Falls back to XLA dense
attention off-TPU (CPU tests), which is differentiable natively.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _mxu_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _make_fwd_kernel(mxu_dtype):
    from jax.experimental import pallas as pl

    def kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
               acc_ref, m_ref, l_ref):
        ki = pl.program_id(3)
        nki = pl.num_programs(3)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        q = q_ref[0, 0].astype(mxu_dtype)  # [BQ, D]
        k = k_ref[0, 0].astype(mxu_dtype)  # [BK, D]
        v = v_ref[0, 0].astype(mxu_dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK] fp32
        s = s + mask_ref[0, 0][None, :]  # additive bias row

        m_prev = m_ref[:, 0]
        l_prev = l_ref[:, 0]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(mxu_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, 0] = m_new
        l_ref[:, 0] = l_new

        @pl.when(ki == nki - 1)
        def _():
            l_fin = l_ref[:, 0]
            # NB: with the additive -1e30 bias, masked scores stay finite, so
            # l_fin > 0 always holds and a fully-masked query row outputs a
            # softmax over masked values (garbage, like the reference's
            # uniform mean) — callers must mask padded query rows downstream.
            # The guard only protects against exact-zero underflow.
            safe_l = jnp.where(l_fin > 0, l_fin, 1.0)
            o_ref[0, 0] = (acc_ref[:] / safe_l[:, None]).astype(o_ref.dtype)
            lse_ref[0, 0, :, 0] = m_ref[:, 0] + jnp.log(safe_l)

    return kernel


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _make_dq_kernel(mxu_dtype):
    from jax.experimental import pallas as pl

    def kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_acc):
        ki = pl.program_id(3)
        nki = pl.num_programs(3)

        @pl.when(ki == 0)
        def _():
            dq_acc[:] = jnp.zeros_like(dq_acc)

        q = q_ref[0, 0].astype(mxu_dtype)
        k = k_ref[0, 0].astype(mxu_dtype)
        v = v_ref[0, 0].astype(mxu_dtype)
        do = do_ref[0, 0].astype(mxu_dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + mask_ref[0, 0][None, :]
        p = jnp.exp(s - lse_ref[0, 0, :, 0][:, None])  # [BQ, BK]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        ds = p * (dp - delta_ref[0, 0, :, 0][:, None])
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(mxu_dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ki == nki - 1)
        def _():
            dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)

    return kernel


def _make_dkv_kernel(mxu_dtype):
    from jax.experimental import pallas as pl

    def kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
               dk_ref, dv_ref, dk_acc, dv_acc):
        qi = pl.program_id(3)
        nqi = pl.num_programs(3)

        @pl.when(qi == 0)
        def _():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

        q = q_ref[0, 0].astype(mxu_dtype)
        k = k_ref[0, 0].astype(mxu_dtype)
        v = v_ref[0, 0].astype(mxu_dtype)
        do = do_ref[0, 0].astype(mxu_dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        s = s + mask_ref[0, 0][None, :]
        p = jnp.exp(s - lse_ref[0, 0, :, 0][:, None])
        dv_acc[:] += jax.lax.dot_general(
            p.astype(mxu_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0, :, 0][:, None])  # [BQ, BK]
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(mxu_dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, D]

        @pl.when(qi == nqi - 1)
        def _():
            dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp core over padded, pre-scaled inputs
# ---------------------------------------------------------------------------


def _fwd_impl(cfg, q, k, v, mask_f):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_q, block_k, precision = cfg
    b, h, nq, d = q.shape
    nk = k.shape[2]
    grid = (b, h, nq // block_q, nk // block_k)
    kernel = _make_fwd_kernel(_mxu_dtype(precision))

    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    m_spec = pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki))
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, m_spec],
        out_specs=(q_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v, mask_f)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg, q, k, v, mask_f):
    out, _ = _fwd_impl(cfg, q, k, v, mask_f)
    return out


def _flash_core_fwd(cfg, q, k, v, mask_f):
    out, lse = _fwd_impl(cfg, q, k, v, mask_f)
    return out, (q, k, v, mask_f, out, lse)


def _flash_core_bwd(cfg, res, do):
    q, k, v, mask_f, out, lse = res
    do = do.astype(jnp.float32)
    delta = jnp.sum(do * out, axis=-1, keepdims=True)  # [B, H, Nq, 1]
    dq, dk, dv = _bwd_impl(cfg, q, k, v, mask_f, do, lse, delta)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(mask_f),  # bias rows carry no useful gradient
    )


def _bwd_impl(cfg, q, k, v, mask_f, do, lse, delta):
    """The two flash backward pallas sweeps, with the row logsumexp and
    delta = rowsum(dO ⊙ O) supplied by the caller — reused by the ring
    self-attention backward, where lse/delta are GLOBAL over the ring while
    (k, v) are one rotating chunk. Returns fp32 (dq, dk, dv)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_q, block_k, precision = cfg
    b, h, nq, d = q.shape
    nk = k.shape[2]

    q_spec = lambda order: pl.BlockSpec(
        (1, 1, block_q, d),
        (lambda bi, hi, qi, ki: (bi, hi, qi, 0))
        if order == "q_outer"
        else (lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
    )
    kv_spec = lambda order: pl.BlockSpec(
        (1, 1, block_k, d),
        (lambda bi, hi, qi, ki: (bi, hi, ki, 0))
        if order == "q_outer"
        else (lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
    )
    m_spec = lambda order: pl.BlockSpec(
        (1, 1, block_k),
        (lambda bi, hi, qi, ki: (bi, 0, ki))
        if order == "q_outer"
        else (lambda bi, hi, ki, qi: (bi, 0, ki)),
    )
    row_spec = lambda order: pl.BlockSpec(
        (1, 1, block_q, 1),
        (lambda bi, hi, qi, ki: (bi, hi, qi, 0))
        if order == "q_outer"
        else (lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
    )

    flops = 5 * 2 * b * h * nq * nk * d
    dq = pl.pallas_call(
        _make_dq_kernel(_mxu_dtype(precision)),
        grid=(b, h, nq // block_q, nk // block_k),
        in_specs=[q_spec("q_outer"), kv_spec("q_outer"), kv_spec("q_outer"),
                  m_spec("q_outer"), q_spec("q_outer"), row_spec("q_outer"),
                  row_spec("q_outer")],
        out_specs=q_spec("q_outer"),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v, mask_f, do, lse, delta)

    dk, dv = pl.pallas_call(
        _make_dkv_kernel(_mxu_dtype(precision)),
        grid=(b, h, nk // block_k, nq // block_q),
        in_specs=[q_spec("k_outer"), kv_spec("k_outer"), kv_spec("k_outer"),
                  m_spec("k_outer"), q_spec("k_outer"), row_spec("k_outer"),
                  row_spec("k_outer")],
        out_specs=(kv_spec("k_outer"), kv_spec("k_outer")),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v, mask_f, do, lse, delta)

    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,  # [B, H, Nq, D]
    k: jnp.ndarray,  # [B, H, Nk, D]
    v: jnp.ndarray,  # [B, H, Nk, D]
    mask: Optional[jnp.ndarray] = None,  # [B, Nk] bool, True = attend
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    mxu_precision: str = "fp32",  # "fp32" | "bf16" (bf16 operands, fp32 accum)
) -> jnp.ndarray:
    """Masked attention; Pallas fwd+bwd on TPU, XLA dense elsewhere.

    Measured at the d_head=32 TransLayer envelope (tools/bench_flash.py,
    BASELINE.md): the kernel is VPU-bound (exp/max/sum over the [BQ, BK]
    score tile), so fp32 MXU operands are the fastest choice at this head
    size — bf16 packing buys nothing and costs a cast. 512/1024 blocks
    amortize per-step overhead (11.6 vs 8.0 TFLOP/s at 256/512)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    q = q * scale
    if mask is None:
        mask = jnp.ones((b, nk), dtype=bool)

    if jax.default_backend() != "tpu":
        from .attention import dense_attention

        out, _, _ = dense_attention(q, k, v, key_valid=mask, scale=1.0)
        return out

    block_q = min(block_q, max(nq, 8))
    # pad sequence lengths to block multiples
    pad_q = (-nq) % block_q
    pad_k = (-nk) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)), constant_values=False)
    # additive bias row: 0 where valid, NEG_INF where masked
    mask_f = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    out_dtype = q.dtype
    if mxu_precision == "bf16":
        # cast in XLA so operands land in VMEM already in native bf16
        # (16, 128) tiling — in-kernel fp32->bf16 repacking is very slow
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))

    cfg = (block_q, block_k, mxu_precision)
    out = _flash_core(cfg, q, k, v, mask_f)
    return out[:, :, :nq].astype(out_dtype)


# ---------------------------------------------------------------------------
# partial (chunk) attention — building blocks for ring self-attention
# ---------------------------------------------------------------------------


def _pad_rows(t, pad, axis=2):
    if not pad:
        return t
    widths = [(0, 0)] * t.ndim
    widths[axis] = (0, pad)
    return jnp.pad(t, widths)


def flash_attention_partial(
    q: jnp.ndarray,  # [B, H, Nq, D] PRE-SCALED queries
    k: jnp.ndarray,  # [B, H, Nk, D] one key chunk
    v: jnp.ndarray,  # [B, H, Nk, D]
    mask: Optional[jnp.ndarray] = None,  # [B, Nk] bool, True = attend
    block_q: int = 512,
    block_k: int = 1024,
    mxu_precision: str = "fp32",
):
    """Attention of ``q`` against ONE key chunk, softmax-normalized within
    the chunk, returning ``(out fp32, lse fp32 [B, H, Nq])`` so partial
    outputs merge exactly by logsumexp (ring self-attention,
    :func:`imp_tpu.parallel.sequence.ring_self_attention`).  NOT
    differentiable — the ring wraps fwd+bwd in one ``custom_vjp``.

    Masked chunks follow the flash kernel's additive −1e30 bias contract:
    a row with no valid key in this chunk returns lse ≈ −1e30, whose merge
    weight underflows to exactly 0 against any chunk holding a valid key."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if mask is None:
        mask = jnp.ones((b, nk), dtype=bool)

    if jax.default_backend() != "tpu":
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        s = s + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
        lse = jax.scipy.special.logsumexp(s, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", jnp.exp(s - lse[..., None]), v,
            preferred_element_type=jnp.float32,
        )
        return out, lse

    block_q = min(block_q, -(-nq // 8) * 8)  # keep sublane (8) alignment
    block_k = min(block_k, -(-nk // 128) * 128)  # keep lane (128) alignment
    pad_q, pad_k = (-nq) % block_q, (-nk) % block_k
    q = _pad_rows(q, pad_q)
    k, v = _pad_rows(k, pad_k), _pad_rows(v, pad_k)
    mask = jnp.pad(mask, ((0, 0), (0, pad_k)), constant_values=False)
    mask_f = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if mxu_precision == "bf16":
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out, lse = _fwd_impl((block_q, block_k, mxu_precision), q, k, v, mask_f)
    return out[:, :, :nq], lse[:, :, :nq, 0]


def flash_attention_partial_bwd(
    q: jnp.ndarray,  # [B, H, Nq, D] PRE-SCALED queries
    k: jnp.ndarray,  # [B, H, Nk, D] one key chunk
    v: jnp.ndarray,  # [B, H, Nk, D]
    mask: Optional[jnp.ndarray],  # [B, Nk] bool
    do: jnp.ndarray,  # [B, H, Nq, D] fp32 output cotangent
    lse: jnp.ndarray,  # [B, H, Nq] GLOBAL row logsumexp (post-merge)
    delta: jnp.ndarray,  # [B, H, Nq] GLOBAL rowsum(dO ⊙ O)
    block_q: int = 512,
    block_k: int = 1024,
    mxu_precision: str = "fp32",
):
    """This chunk's share of the flash backward, with the global softmax
    statistics supplied: p = exp(s − lse) is the TRUE global attention
    probability restricted to these columns, so the standard dq/dk/dv
    formulas apply per chunk and sum to the exact gradient over the ring.
    Returns fp32 ``(dq_contrib, dk, dv)``."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if mask is None:
        mask = jnp.ones((b, nk), dtype=bool)

    if jax.default_backend() != "tpu":
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        s = s + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
        p = jnp.exp(s - lse[..., None])
        dv = jnp.einsum(
            "bhqk,bhqd->bhkd", p, do, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", do, v, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[..., None])
        dq = jnp.einsum(
            "bhqk,bhkd->bhqd", ds, k, preferred_element_type=jnp.float32
        )
        dk = jnp.einsum(
            "bhqk,bhqd->bhkd", ds, q, preferred_element_type=jnp.float32
        )
        return dq, dk, dv

    block_q = min(block_q, -(-nq // 8) * 8)  # keep sublane (8) alignment
    block_k = min(block_k, -(-nk // 128) * 128)  # keep lane (128) alignment
    pad_q, pad_k = (-nq) % block_q, (-nk) % block_k
    # padded q rows: q/do/delta pad with zeros ⇒ dv share = pᵀ·0 = 0 and
    # ds = p·(0 − 0) = 0 regardless of the lse pad value, so dk/dv stay
    # exact; the garbage dq rows are sliced off below
    q, do = _pad_rows(q, pad_q), _pad_rows(do.astype(jnp.float32), pad_q)
    lse = _pad_rows(lse[..., None], pad_q)
    delta = _pad_rows(delta[..., None], pad_q)
    k, v = _pad_rows(k, pad_k), _pad_rows(v, pad_k)
    mask = jnp.pad(mask, ((0, 0), (0, pad_k)), constant_values=False)
    mask_f = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    if mxu_precision == "bf16":
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    dq, dk, dv = _bwd_impl(
        (block_q, block_k, mxu_precision), q, k, v, mask_f, do, lse, delta
    )
    return dq[:, :, :nq], dk[:, :, :nk], dv[:, :, :nk]
