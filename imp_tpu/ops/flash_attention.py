"""Masked flash attention as a Pallas TPU kernel.

Exact O(N^2) attention over whole-slide bags with online softmax — offered
as ``TPU.ATTENTION=flash``, an exact alternative to the reference's Nyström
approximation (``medmm/modeling/ops/attention.py:46-161``) that the
10k-token bag envelope (``data_manager.py:387``) makes affordable on TPU.

Kernel layout: canonical 4D grid (batch, head, q-block, kv-block) with the
kv axis iterating fastest; per-(q-block) running max / sum / accumulator
live in VMEM scratch across the kv sweep, and the output block is written
on the last kv step.  KV streams through VMEM block by block, so VMEM use
is O(block sizes), not O(N).  A [B, N] validity mask is honored per key.
Falls back to an XLA dense implementation off-TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _make_flash_kernel(mxu_dtype):
    """Kernel factory. ``mxu_dtype`` is the operand dtype fed to the MXU:
    bfloat16 = single-pass matmuls (XLA's own default for fp32 dense
    attention on TPU), float32 = multi-pass exact. Accumulation is always
    fp32."""
    from jax.experimental import pallas as pl

    def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref):
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
        # mask arrives as an additive bias row (0 valid / NEG_INF masked):
        # one vadd instead of a compare+select over the score tile
        s = s + mask_ref[0, 0][None, :]

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
            safe_l = jnp.where(l_fin > 0, l_fin, 1.0)  # fully-masked rows -> 0
            o_ref[0, 0] = (acc_ref[:] / safe_l[:, None]).astype(o_ref.dtype)

    return _flash_kernel


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
    """Masked attention; Pallas on TPU, XLA dense elsewhere.

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

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    nq_p, nk_p = nq + pad_q, nk + pad_k
    # additive bias row: 0 where valid, NEG_INF where masked
    mask_f = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    out_dtype = q.dtype
    if mxu_precision == "bf16":
        # cast in XLA so operands land in VMEM already in native bf16
        # (16, 128) tiling — in-kernel fp32->bf16 repacking is very slow
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))

    grid = (b, h, nq_p // block_q, nk_p // block_k)
    kernel = _make_flash_kernel(
        jnp.bfloat16 if mxu_precision == "bf16" else jnp.float32
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nq_p, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_p * nk_p * d,
            bytes_accessed=(q.size + k.size + v.size) * 4,
            transcendentals=b * h * nq_p * nk_p,
        ),
    )(q, k, v, mask_f)
    return out[:, :, :nq]
