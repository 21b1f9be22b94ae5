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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref):
    from jax.experimental import pallas as pl

    ki = pl.program_id(3)
    nki = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0, 0].astype(jnp.float32)
    valid = mask_ref[0, 0] > 0  # [BK]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    s = jnp.where(valid[None, :], s, NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new[:, None])
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:, 0] = m_new
    l_ref[:, 0] = l_new

    @pl.when(ki == nki - 1)
    def _():
        l_fin = l_ref[:, 0]
        safe_l = jnp.where(l_fin > 0, l_fin, 1.0)  # fully-masked rows -> 0
        o_ref[0, 0] = (acc_ref[:] / safe_l[:, None]).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Nq, D]
    k: jnp.ndarray,  # [B, H, Nk, D]
    v: jnp.ndarray,  # [B, H, Nk, D]
    mask: Optional[jnp.ndarray] = None,  # [B, Nk] bool, True = attend
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """Exact masked attention; Pallas on TPU, XLA dense elsewhere."""
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
    mask_f = mask.astype(jnp.float32)[:, None, :]  # [B, 1, Nk] (TPU tiling)

    grid = (b, h, nq_p // block_q, nk_p // block_k)
    out = pl.pallas_call(
        _flash_kernel,
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
        out_shape=jax.ShapeDtypeStruct((b, h, nq_p, d), q.dtype),
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
