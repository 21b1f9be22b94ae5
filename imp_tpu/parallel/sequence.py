"""Sequence parallelism over the bag/token axis (all-gather-KV flavor).

A NEW capability beyond reference parity (SURVEY §5: "optional device-axis
sequence sharding ... for 100k-patch slides"): the O(N²) modularity loss
and the prototype cross-attention — the two bag-quadratic/-linear hot spots
of the flagship — computed with the 10k-100k token axis sharded over a
``seq`` mesh axis.

Design (all-gather-KV): each device holds an N/sp token shard. For the
modularity passes it all-gathers the (already L2-normalized, masked) bag
once — O(N·D) comms on ICI — then sweeps ONLY ITS OWN row block of the
[N, N] adjacency/assignment space, 1/sp of the quadratic work. Per-set
traces psum to identical replicated scalars; the prototype cotangent is
produced rowwise during the sweep exactly like the single-device
:mod:`imp_tpu.ops.modularity` kernels (the factor-2 row-side identity holds
globally because every unordered (i, j) pair lands in exactly one device's
row sweep and all matrices involved are symmetric).

Use inside ``jax.experimental.shard_map`` over a mesh with a ``seq`` axis;
batch-axis data parallelism composes on an outer ``data`` axis. Gradients
flow to the (replicated) prototype tokens; the bag is stop-gradient'd, the
same contract as the single-device loss (ref ``umeml_gan.py:516-526``
backpropagates modularity only into the prototypes).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.modularity import (
    _BLOCK,
    _adjacency_block,
    _cc_max_block,
    _prepare,
    _row_blocks,
)


def _sp_passes(norm_x_local, Cs_local, temp, axis_name):
    """Local-row-block degree + value/gradient sweeps against the gathered
    bag. Returns (replicated traces, per-local-row dC residuals)."""
    b, nl, _ = norm_x_local.shape
    sp = lax.axis_size(axis_name)
    n = nl * sp
    start = lax.axis_index(axis_name) * nl

    # one O(N D) gather of the normalized masked bag; masked rows are zero
    norm_x = lax.all_gather(norm_x_local, axis_name, axis=1, tiled=True)
    Cs = [lax.all_gather(C, axis_name, axis=2, tiled=True) for C in Cs_local]

    xb = _row_blocks(norm_x_local, _BLOCK)  # [nb, B, R, D]
    cbs = [_row_blocks(jnp.moveaxis(C, 1, 2), _BLOCK) for C in Cs_local]
    nb = xb.shape[0]
    # global row indices of the local shard; padded rows point past every
    # column (their adjacency is zero anyway)
    idx = start + jnp.arange(nb * _BLOCK).reshape(nb, _BLOCK)

    def deg_step(_, inp):
        x_blk, idx_blk = inp
        a = _adjacency_block(x_blk, norm_x, idx_blk, n)
        return None, a.sum(axis=2, dtype=jnp.float32)

    _, degs = lax.scan(deg_step, None, (xb, idx))  # [nb, B, R]
    deg_local = jnp.moveaxis(degs, 0, 1).reshape(b, -1)[:, :nl]
    deg = lax.all_gather(deg_local, axis_name, axis=1, tiled=True)  # [B, N]
    # e via psum (not a sum of the gathered array): provably replicated,
    # keeping the traces invariant over the seq axis
    e = jnp.maximum(lax.psum(deg_local.sum(axis=1), axis_name), 1e-12)
    inv_e = (1.0 / e)[:, None, None]
    inv_temp = 1.0 / temp
    deg_pad = jnp.pad(deg, ((0, 0), (0, _BLOCK)))  # covers padded row idx

    def main_step(carry, inp):
        x_blk, idx_blk = inp[0], inp[1]
        c_blks = inp[2:]
        a = _adjacency_block(x_blk, norm_x, idx_blk, n)
        idx_safe = jnp.minimum(idx_blk, n + _BLOCK - 1)
        deg_blk = jnp.take_along_axis(
            deg_pad, jnp.broadcast_to(idx_safe[None, :], (b, idx_safe.size)),
            axis=1,
        )
        dd = deg_blk[:, :, None] * deg[:, None, :]
        a_m_dd = (a - dd * inv_e) * inv_e
        new_carry, dc_blks = [], []
        for ki, (C, c_blk) in enumerate(zip(Cs, c_blks)):
            s1, q = carry[2 * ki], carry[2 * ki + 1]
            cc, best_p = _cc_max_block(jnp.moveaxis(c_blk, 2, 1), C)
            delta = jnp.tanh(cc * inv_temp)
            s1 = s1 + jnp.sum(a * delta, axis=(1, 2), dtype=jnp.float32)
            q = q + jnp.sum(delta * dd, axis=(1, 2), dtype=jnp.float32)
            w = a_m_dd * ((1.0 - delta * delta) * inv_temp)
            dc_blk = jnp.stack(
                [
                    2.0
                    * jnp.einsum(
                        "brn,bn->br", w * (best_p == pi), C[:, pi, :],
                        preferred_element_type=jnp.float32,
                    )
                    for pi in range(C.shape[1])
                ],
                axis=1,
            )  # [B, P, R]
            new_carry += [s1, q]
            dc_blks.append(dc_blk)
        return tuple(new_carry), tuple(dc_blks)

    # under shard_map the carry must carry the same device-varying axes as
    # the sharded inputs (seq, plus any outer data axis) — inherit them
    # from the local shard instead of naming axes explicitly
    zeros = 0.0 * norm_x_local[:, 0, 0].astype(jnp.float32)
    carry, dcs = lax.scan(
        main_step, tuple(zeros for _ in range(2 * len(Cs_local))), (xb, idx, *cbs)
    )
    traces, dCs = [], []
    for ki in range(len(Cs_local)):
        s1 = lax.psum(carry[2 * ki], axis_name)
        q = lax.psum(carry[2 * ki + 1], axis_name)
        traces.append((s1 - q / e) / e)
        dCs.append(jnp.concatenate(list(dcs[ki]), axis=2)[:, :, :nl])
    return tuple(traces), tuple(dCs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sp_traces(axis_name: str, temp: float, norm_x_local, *Cs_local):
    traces, _ = _sp_passes(norm_x_local, Cs_local, temp, axis_name)
    return traces


def _sp_traces_fwd(axis_name, temp, norm_x_local, *Cs_local):
    traces, dCs = _sp_passes(norm_x_local, Cs_local, temp, axis_name)
    return traces, dCs


def _sp_traces_bwd(axis_name, temp, res, gts):
    grads = tuple(
        gt[:, None, None].astype(dC.dtype) * dC for gt, dC in zip(gts, res)
    )
    return (None,) + grads


_sp_traces.defvjp(_sp_traces_fwd, _sp_traces_bwd)


def compute_modularity_pair_sp(
    c_list: Sequence[jnp.ndarray],  # K x [B, P_k, D], replicated over seq
    x_local: jnp.ndarray,  # [B, N/sp, D] local token shard
    valid_local: Optional[jnp.ndarray] = None,  # [B, N/sp]
    temp: float = 0.1,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Sequence-sharded twin of
    :func:`imp_tpu.ops.modularity.compute_modularity_pair` — call under
    ``shard_map`` with the token axis sharded on ``axis_name``. Returns the
    identical (replicated) scalar; gradients flow to ``c_list``."""
    norm_x_local, Cs_local = _prepare(tuple(c_list), x_local, valid_local)
    traces = _sp_traces(axis_name, float(temp), norm_x_local, *Cs_local)
    return sum(-jnp.mean(t) * 100.0 for t in traces)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ring_traces(axis_name: str, temp: float, norm_x_local, *Cs_local):
    traces, _ = _ring_passes(norm_x_local, Cs_local, temp, axis_name)
    return traces


def _ring_traces_fwd(axis_name, temp, norm_x_local, *Cs_local):
    traces, dCs = _ring_passes(norm_x_local, Cs_local, temp, axis_name)
    return traces, dCs


_ring_traces.defvjp(_ring_traces_fwd, _sp_traces_bwd)


def compute_modularity_pair_ring(
    c_list: Sequence[jnp.ndarray],
    x_local: jnp.ndarray,
    valid_local: Optional[jnp.ndarray] = None,
    temp: float = 0.1,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Ring-streamed twin of :func:`compute_modularity_pair_sp`: per-device
    memory stays O(N/sp) — column chunks rotate over ICI via ``ppermute``
    instead of being all-gathered. Use for bags too large to replicate
    (the 100k-patch envelope)."""
    norm_x_local, Cs_local = _prepare(tuple(c_list), x_local, valid_local)
    traces = _ring_traces(axis_name, float(temp), norm_x_local, *Cs_local)
    return sum(-jnp.mean(t) * 100.0 for t in traces)


def _ring_passes(norm_x_local, Cs_local, temp, axis_name):
    """Ring version of :func:`_sp_passes`: instead of all-gathering the bag,
    the column chunks (x, C, degrees) rotate around the ring via
    ``ppermute`` — per-device memory stays O(N/sp), so bags far larger than
    one device's HBM stream through. Two ring sweeps (degrees, then
    value+gradient), each overlapping compute with the ICI transfer."""
    b, nl, _ = norm_x_local.shape
    sp = lax.axis_size(axis_name)
    n = nl * sp
    me = lax.axis_index(axis_name)
    start = me * nl
    perm = [(i, (i + 1) % sp) for i in range(sp)]  # shift chunks left

    xb = _row_blocks(norm_x_local, _BLOCK)  # [nb, B, R, D]
    nb = xb.shape[0]
    row_idx = start + jnp.arange(nb * _BLOCK).reshape(nb, _BLOCK)
    k = len(Cs_local)
    inv_temp = 1.0 / temp

    def _chunk_adjacency(x_blk, x_chunk, ridx, col_idx):
        a = jax.nn.relu(
            jnp.einsum(
                "brd,bnd->brn", x_blk, x_chunk,
                preferred_element_type=jnp.float32,
            )
        )
        return a * (ridx[:, None] != col_idx[None, :])

    # ---- sweep 1: degrees ------------------------------------------------
    def deg_ring_step(t, carry):
        x_chunk, deg_acc = carry
        # perm (i -> i+1) means device me receives from me-1, so after t
        # rotations the resident chunk is the one that started at (me - t)
        col_idx = ((me - t) % sp) * nl + jnp.arange(nl)

        def blk(_, inp):
            x_blk, ridx = inp
            a = _chunk_adjacency(x_blk, x_chunk, ridx, col_idx)
            return None, a.sum(axis=2, dtype=jnp.float32)

        _, degs = lax.scan(blk, None, (xb, row_idx))
        deg_acc = deg_acc + jnp.moveaxis(degs, 0, 1).reshape(b, -1)[:, :nl]
        x_chunk = lax.ppermute(x_chunk, axis_name, perm)
        return x_chunk, deg_acc

    deg_local = jnp.zeros((b, nl), jnp.float32) + 0.0 * norm_x_local[:, :, 0]
    # ON CPU the ring loops are UNROLLED (sp is static): each hop's
    # ppermute becomes a distinct collective instance rather than one
    # channel re-entered sp times from inside a fori_loop — XLA:CPU's
    # in-process rendezvous can deadlock on the reused-channel pattern
    # under thread starvation (observed: 7 threads parked across a permute
    # and a psum of the same op_id).  On TPU the fori_loop stays: its
    # loop-carried chunks rotate through ONE buffer, preserving the
    # O(N/sp) per-device memory contract at the 100k-patch envelope
    # (unrolling keeps per-hop chunk copies live).
    unroll = jax.default_backend() == "cpu"
    if unroll:
        carry = (norm_x_local, deg_local)
        for t in range(sp):
            carry = deg_ring_step(t, carry)
    else:
        carry = lax.fori_loop(
            0, sp, deg_ring_step, (norm_x_local, deg_local)
        )
    _, deg_local = carry
    e = jnp.maximum(lax.psum(deg_local.sum(axis=1), axis_name), 1e-12)
    inv_e = (1.0 / e)[:, None, None]

    # ---- sweep 2: value + prototype cotangent ----------------------------
    cbs_rows = [_row_blocks(jnp.moveaxis(C, 1, 2), _BLOCK) for C in Cs_local]
    deg_rows = _row_blocks(deg_local, _BLOCK)  # [nb, B, R]

    def main_ring_step(t, carry):
        x_chunk, deg_chunk, c_chunks, s1s, qs, dcs = carry
        # perm (i -> i+1) means device me receives from me-1, so after t
        # rotations the resident chunk is the one that started at (me - t)
        col_idx = ((me - t) % sp) * nl + jnp.arange(nl)

        def blk(blk_carry, inp):
            x_blk, ridx, deg_blk = inp[0], inp[1], inp[2]
            c_blks = inp[3:]
            s1_c, q_c = blk_carry
            a = _chunk_adjacency(x_blk, x_chunk, ridx, col_idx)
            dd = deg_blk[:, :, None] * deg_chunk[:, None, :]
            a_m_dd = (a - dd * inv_e) * inv_e
            new_s1, new_q, dc_blks = [], [], []
            for ki in range(k):
                C_chunk = c_chunks[ki]  # [B, P, Nl] columns of this chunk
                c_blk = c_blks[ki]  # [B, R, P] local rows
                cc, best_p = _cc_max_block(jnp.moveaxis(c_blk, 2, 1), C_chunk)
                delta = jnp.tanh(cc * inv_temp)
                new_s1.append(
                    s1_c[ki] + jnp.sum(a * delta, axis=(1, 2), dtype=jnp.float32)
                )
                new_q.append(
                    q_c[ki] + jnp.sum(delta * dd, axis=(1, 2), dtype=jnp.float32)
                )
                w = a_m_dd * ((1.0 - delta * delta) * inv_temp)
                dc_blk = jnp.stack(
                    [
                        2.0
                        * jnp.einsum(
                            "brn,bn->br", w * (best_p == pi), C_chunk[:, pi, :],
                            preferred_element_type=jnp.float32,
                        )
                        for pi in range(C_chunk.shape[1])
                    ],
                    axis=1,
                )  # [B, P, R] — this row block's rows only
                dc_blks.append(dc_blk)
            return (tuple(new_s1), tuple(new_q)), tuple(dc_blks)

        zero_s = tuple(0.0 * norm_x_local[:, 0, 0] for _ in range(k))
        (s1_c, q_c), dc_stacked = lax.scan(
            blk, (zero_s, zero_s), (xb, row_idx, deg_rows, *cbs_rows)
        )
        s1s = tuple(s + sc for s, sc in zip(s1s, s1_c))
        qs = tuple(q + qc for q, qc in zip(qs, q_c))
        # [nb, B, P, R] -> [B, P, nb*R] (row blocks back in order), then
        # accumulate this chunk's column contribution for the local rows
        dcs = tuple(
            d + jnp.moveaxis(ds, 0, 2).reshape(b, ds.shape[2], -1)[:, :, :nl]
            for d, ds in zip(dcs, dc_stacked)
        )
        x_chunk = lax.ppermute(x_chunk, axis_name, perm)
        deg_chunk = lax.ppermute(deg_chunk, axis_name, perm)
        c_chunks = tuple(
            lax.ppermute(c, axis_name, perm) for c in c_chunks
        )
        return x_chunk, deg_chunk, c_chunks, s1s, qs, dcs

    zeros_b = tuple(0.0 * norm_x_local[:, 0, 0] for _ in range(k))
    dc_init = tuple(
        jnp.zeros((b, C.shape[1], nl), jnp.float32)
        + 0.0 * norm_x_local[:, :1, :1]
        for C in Cs_local
    )
    carry = (
        norm_x_local,
        deg_local,
        tuple(Cs_local),
        zeros_b,
        zeros_b,
        dc_init,
    )
    if unroll:  # CPU: see the deg-pass note above
        for t in range(sp):
            carry = main_ring_step(t, carry)
    else:  # TPU: rotating buffers = O(N/sp) memory
        carry = lax.fori_loop(0, sp, main_ring_step, carry)
    _, _, _, s1s, qs, dcs = carry
    traces = tuple(
        (lax.psum(s1, axis_name) - lax.psum(q, axis_name) / e) / e
        for s1, q in zip(s1s, qs)
    )
    return traces, dcs


def self_attention_tokens_sp(
    q_local: jnp.ndarray,  # [B, H, N/sp, D] query shard
    k_local: jnp.ndarray,  # [B, H, N/sp, D] key shard
    v_local: jnp.ndarray,  # [B, H, N/sp, D] value shard
    valid_local: Optional[jnp.ndarray] = None,  # [B, N/sp]
    axis_name: str = "seq",
    **flash_kwargs,
) -> jnp.ndarray:
    """Exact self-attention over a sequence-sharded bag (all-gather-KV):
    keys/values/mask gather once over ``axis_name`` (O(N·D) on ICI), then
    each device runs the Pallas flash kernel on its query shard against
    the full keys — 1/sp of the O(N²) work per device. Differentiable:
    the flash core has a custom_vjp and the gather transposes to a
    reduce-scatter. The building block for TransLayer-style models
    (TransMIL) on 100k-patch bags. For bags too large to replicate K/V on
    one device, use the O(N/sp)-memory :func:`ring_self_attention`."""
    from ..ops.flash_attention import flash_attention

    k = lax.all_gather(k_local, axis_name, axis=2, tiled=True)
    v = lax.all_gather(v_local, axis_name, axis=2, tiled=True)
    mask = (
        lax.all_gather(valid_local, axis_name, axis=1, tiled=True)
        if valid_local is not None
        else None
    )
    return flash_attention(q_local, k, v, mask=mask, **flash_kwargs)


def ring_self_attention(
    q_local: jnp.ndarray,  # [B, H, N/sp, D] query shard
    k_local: jnp.ndarray,  # [B, H, N/sp, D] key shard
    v_local: jnp.ndarray,  # [B, H, N/sp, D] value shard
    valid_local: Optional[jnp.ndarray] = None,  # [B, N/sp]
    scale: Optional[float] = None,
    axis_name: str = "seq",
    block_q: int = 512,
    block_k: int = 1024,
    mxu_precision: str = "fp32",
) -> jnp.ndarray:
    """Exact self-attention over a sequence-sharded bag with **O(N/sp)
    per-device memory** — the ring twin of
    :func:`self_attention_tokens_sp`, for bags too large to replicate
    (>100k-patch / 1M-token slides).

    K/V/mask chunks rotate around the ring via ``ppermute`` while each
    device folds them into its queries' running online softmax
    (flash-style partial outputs merged exactly by logsumexp); nothing of
    size N ever materializes on one device, and each hop overlaps the ICI
    transfer with the chunk's attention compute.  Differentiable via a
    ``custom_vjp`` that re-runs the ring (recompute-not-store, like the
    flash kernel's two-sweep backward): dK/dV accumulators travel WITH
    their chunks and arrive home after the sp-step cycle.  Per-chunk math
    runs on the same Pallas kernels as :func:`...flash_attention` on TPU
    (dense XLA fallback elsewhere)."""
    d = q_local.shape[-1]
    if scale is None:
        scale = d**-0.5
    if valid_local is None:
        valid_local = jnp.ones(q_local.shape[:1] + q_local.shape[2:3], bool)
    # rotate the mask as f32 (ppermute on bool is backend-dependent)
    mask_f = valid_local.astype(jnp.float32)
    cfg = (int(block_q), int(block_k), str(mxu_precision))
    out = _ring_attn(axis_name, cfg, q_local * scale, k_local, v_local, mask_f)
    return out.astype(q_local.dtype)


def _ring_attn_fwd_loop(axis_name, cfg, q, k0, v0, m0):
    from ..ops.flash_attention import flash_attention_partial

    sp = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    bq, bk, prec = cfg

    def step(t, carry):
        k_c, v_c, m_c, o, lse = carry
        o_t, lse_t = flash_attention_partial(
            q, k_c, v_c, m_c > 0.5,
            block_q=bq, block_k=bk, mxu_precision=prec,
        )
        # exact merge of partial softmaxes: lse_t is always finite (the
        # kernel's additive −1e30 bias), so only the −inf INIT hits the
        # w_old = exp(−inf − finite) = 0 branch — never NaN
        lse_new = jnp.logaddexp(lse, lse_t)
        o = (
            o * jnp.exp(lse - lse_new)[..., None]
            + o_t * jnp.exp(lse_t - lse_new)[..., None]
        )
        return (
            lax.ppermute(k_c, axis_name, perm),
            lax.ppermute(v_c, axis_name, perm),
            lax.ppermute(m_c, axis_name, perm),
            o,
            lse_new,
        )

    o0 = jnp.zeros(q.shape, jnp.float32) + 0.0 * q.astype(jnp.float32)
    lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32) + 0.0 * o0[..., 0]
    # sp rotations = identity: chunks end the loop back at their owners.
    # Kept as fori_loop ON PURPOSE: the loop-carried K/V chunks live in ONE
    # rotating buffer, which is what makes the O(N/sp) memory claim true
    # (unrolling leaves per-hop chunk copies live — measured +40% temp in
    # the TransMIL ring memory test); the XLA:CPU rendezvous deadlock that
    # forced unrolling in _ring_passes has never been observed on this
    # attention path.
    _, _, _, out, lse = lax.fori_loop(0, sp, step, (k0, v0, m0, o0, lse0))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ring_attn(axis_name: str, cfg, q, k0, v0, m0):
    out, _ = _ring_attn_fwd_loop(axis_name, cfg, q, k0, v0, m0)
    return out


def _ring_attn_fwd(axis_name, cfg, q, k0, v0, m0):
    out, lse = _ring_attn_fwd_loop(axis_name, cfg, q, k0, v0, m0)
    return out, (q, k0, v0, m0, out, lse)


def _ring_attn_bwd(axis_name, cfg, res, do):
    from ..ops.flash_attention import flash_attention_partial_bwd

    q, k0, v0, m0, out, lse = res
    do = do.astype(jnp.float32)
    delta = jnp.sum(do * out, axis=-1)  # [B, H, N/sp] — global, rows local
    sp = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    bq, bk, prec = cfg

    def step(t, carry):
        k_c, v_c, m_c, dk_c, dv_c, dq = carry
        dq_t, dk_t, dv_t = flash_attention_partial_bwd(
            q, k_c, v_c, m_c > 0.5, do, lse, delta,
            block_q=bq, block_k=bk, mxu_precision=prec,
        )
        # dk/dv accumulators rotate WITH their chunk: initialized at the
        # owner, they visit every device's query rows once and are home
        # after the sp-step cycle
        return (
            lax.ppermute(k_c, axis_name, perm),
            lax.ppermute(v_c, axis_name, perm),
            lax.ppermute(m_c, axis_name, perm),
            lax.ppermute(dk_c + dk_t, axis_name, perm),
            lax.ppermute(dv_c + dv_t, axis_name, perm),
            dq + dq_t,
        )

    z = jnp.zeros(k0.shape, jnp.float32) + 0.0 * k0.astype(jnp.float32)
    dqz = jnp.zeros(q.shape, jnp.float32) + 0.0 * q.astype(jnp.float32)
    # fori_loop on purpose (rotating chunk buffers = the O(N/sp) memory
    # contract) — see the forward loop's note
    _, _, _, dk, dv, dq = lax.fori_loop(
        0, sp, step, (k0, v0, m0, z, z, dqz)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k0.dtype),
        dv.astype(v0.dtype),
        jnp.zeros_like(m0),  # the mask carries no useful gradient
    )


_ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def cross_attention_tokens_sp(
    q: jnp.ndarray,  # [B, P, D] replicated queries (prototype tokens)
    k_local: jnp.ndarray,  # [B, N/sp, D] local key shard
    v_local: jnp.ndarray,  # [B, N/sp, D] local value shard
    valid_local: Optional[jnp.ndarray] = None,  # [B, N/sp]
    scale: Optional[float] = None,
    axis_name: str = "seq",
) -> jnp.ndarray:
    """Distributed-softmax cross-attention of a few replicated queries over
    a sequence-sharded bag (the PathProtoGenerator pattern: P ~ 7 prototype
    queries, N up to 100k keys). Three scalar-ish collectives (pmax + two
    psums of [B, P(, D)]) — no score matrix ever spans devices."""
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    s = jnp.einsum(
        "bpd,bnd->bpn", q * scale, k_local, preferred_element_type=jnp.float32
    )
    if valid_local is not None:
        s = jnp.where(valid_local[:, None, :], s, -jnp.finfo(s.dtype).max)
    # stop_gradient BEFORE pmax: the max shift is gradient-neutral in
    # softmax, and pmax has no differentiation rule — keep tangents from
    # ever reaching it
    m = lax.pmax(lax.stop_gradient(jnp.max(s, axis=-1)), axis_name)  # [B, P]
    p = jnp.exp(s - m[..., None])
    if valid_local is not None:
        p = p * valid_local[:, None, :]
    num = lax.psum(
        jnp.einsum("bpn,bnd->bpd", p, v_local, preferred_element_type=jnp.float32),
        axis_name,
    )
    den = lax.psum(p.sum(axis=-1), axis_name)  # [B, P]
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)
