"""Graph-modularity clustering loss, batched + masked + streamed.

Faithful re-derivation of reference ``medmm/modeling/ops/utils.py:178-227``
(cosine adjacency ``W = A - d dᵀ/e``, per-prototype rank-1 assignment outer
products, tanh with temperature, max over prototypes, -trace·100), replacing
the per-slide Python loop at the call sites (ref ``umeml_gan.py:516-526``).

TPU-first design: at the reference envelope (bags padded to 10k tokens,
``data_manager.py:387``) the naive formulation materializes several
[B, N, N] buffers (~800 MB each at N=10k fp32) — the step becomes HBM-bound.
Here the O(N²) reductions run in exactly TWO streaming passes:

1. a *degree* pass (row sums of the clipped cosine adjacency), and
2. a *combined value+gradient* pass — the adjacency/assignment tiles needed
   for the loss value and for dL/dC share one elementwise chain, so the
   prototype cotangent is produced in the same pass and stashed as the
   :func:`jax.custom_vjp` residual (the backward is then a single scale).

On TPU both passes are Pallas kernels sweeping only the upper triangle
(everything is symmetric under (I, J) exchange): the degree kernel
accumulates row AND column sums per tile into a resident [1, N] block, and
the combined kernel produces the per-set scalars plus dC in the same sweep
— each (i, j) tile of the adjacency / assignment products lives only in
VMEM, the MXU does the x̂_I x̂_Jᵀ contraction, and only O(N) results
(degrees, dC, per-set scalars) ever reach HBM.  dC reductions run on the
VPU (masked row/col sums): the natural per-prototype [t,t]x[t,1] matvecs
waste 127/128 of the MXU and measured ~2x slower.  Two further structural
wins:

* the model's two modularity terms share one bag
  (``compute_modularity(p_proto, bag) + compute_modularity(h_omic, bag)``,
  ref ``umeml_gan.py:516-526``) — :func:`compute_modularity_pair` fuses them
  so the adjacency matmul and the degree pass run ONCE for both prototype
  sets;
* tiles whose rows or columns lie entirely beyond a slide's valid length
  are skipped at runtime (``pl.when`` on the per-slide valid-block count)
  AND their index maps clamp to the last valid block so the skipped tiles
  move no data either — a 3k-token slide in a 10k pad does ~1/10th of the
  tile work and DMA, mirroring the reference, which computes on the
  unpadded variable-length bag.

Off-TPU (CPU tests) the same math streams through a ``lax.scan`` over row
blocks.

The reference's quirky prototype normalization — ``F.normalize(c.T, dim=1)``
normalizes each feature column over the *prototype* axis rather than each
prototype over features — is reproduced by spec (it is part of the trained
objective).

Masked tokens contribute nothing: their adjacency rows/columns, degrees and
assignment scores are all zero, so the padded fixed-shape bag gives exactly
the same loss as the reference's variable-length bag.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BLOCK = 512  # row/col tile size of the streaming passes.  The combined
# kernel's scoped-VMEM need exceeds the 16 MiB default even at 512 once
# embedded in the train step (16.09 MiB), so the pallas_call always raises
# the limit (compiler_params below).  640 measured ~6% faster standalone
# (5.24 vs 5.58 ms fwd+bwd at the reference envelope); 768 exceeds VMEM
# outright.
_P_PAD = 8  # prototype axis padded to the fp32 sublane tile

# NOTE on precision: bf16 MXU operands were measured NEUTRAL-TO-WORSE for
# every contraction in this module at the reference envelope (this chip
# runs fp32 matmuls at full MXU rate — BASELINE.md r3 anatomy), so all
# dots stay fp32.
# dC reduction backend: "mxu" = per-prototype [ti,tj]x[tj,1] dot_generals,
# "vpu" = masked broadcast-multiply + row reduction, "none" = skip dC
# (measurement only — gradients would be wrong).  The N=1 matvecs waste
# 127/128 of the MXU; the VPU reduction measured 3.0 -> 1.6 ms at the
# reference envelope, so "vpu" is the default.
DC_MODE = "vpu"
# degree backend: "pallas" = symmetric triangular sweep (row+col sums per
# upper-triangle tile, adjacency recomputed in VMEM), "xla" = blocked scan
# (materializes [B, block, N] stripes through HBM)
DEG_MODE = "pallas"
# clamp dead-tile index maps to the last valid block (DMA elision for
# compute-skipped tiles); False restores unclamped maps (rescue knob)
CLAMP_DEAD_TILES = True


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _pad_axis(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ===========================================================================
# Pallas backend (TPU)
# ===========================================================================


def _adjacency_tile(x_i, x_j, i, j, ti, tj):
    a = jax.nn.relu(
        jax.lax.dot_general(
            x_i, x_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    rows = i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    cols = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    return jnp.where(rows != cols, a, 0.0)


def _clamp_block(idx, nvb_bi):
    """Clamp a tile index to the slide's last VALID block: tiles past the
    valid length are compute-skipped (pl.when below), and clamping their
    index maps to a repeated block elides the DMA entirely — a short slide
    in a long pad moves no data for its dead tiles.  (Computed index maps
    over scalar-prefetch values are the same pattern the official pallas
    flash kernels use for causal block skipping.)"""
    if not CLAMP_DEAD_TILES:
        return idx
    return jnp.minimum(idx, jnp.maximum(nvb_bi - 1, 0))


def _combined_kernel(
    il_ref, jl_ref, nvb_ref, x_i_ref, x_j_ref, *refs,
    inv_temp: float, p_counts: Tuple[int, ...]
):
    """refs = [c_i, c_j] * K + [deg, inv_e] + [s1, q, dc] * K."""
    from jax.experimental import pallas as pl

    k = len(p_counts)
    c_refs = refs[: 2 * k]
    deg_ref, inv_e_ref = refs[2 * k], refs[2 * k + 1]
    out_refs = refs[2 * k + 2 :]

    t = pl.program_id(1)
    i, j = il_ref[t], jl_ref[t]
    ti, tj = x_i_ref.shape[1], x_j_ref.shape[1]
    nvb = nvb_ref[pl.program_id(0)]

    @pl.when(t == 0)
    def _():
        for ki in range(k):
            out_refs[3 * ki][0, 0, 0] = 0.0
            out_refs[3 * ki + 1][0, 0, 0] = 0.0
            dc_ref = out_refs[3 * ki + 2]
            dc_ref[:] = jnp.zeros_like(dc_ref)

    # SYMMETRIC SWEEP: adjacency, dd and the assignment products are all
    # symmetric under (I, j) exchange, so the prefetched (i, j) lists cover
    # only the upper triangle — scalars count off-diagonal tiles twice, and
    # dC gets a row-side (slice i) plus a transposed col-side (slice j)
    # contribution from each such tile.  This halves the dominant VPU chain
    # (max-loop/tanh/w), the MXU work and the tile DMA.
    @pl.when(jnp.logical_and(i < nvb, j < nvb))
    def _():
        a = _adjacency_tile(x_i_ref[0], x_j_ref[0], i, j, ti, tj)
        deg_i = deg_ref[0, 0, pl.ds(i * ti, ti)]
        deg_j = deg_ref[0, 0, pl.ds(j * tj, tj)]
        inv_e = inv_e_ref[0, 0, 0]
        dd = deg_i[:, None] * deg_j[None, :]
        a_m_dd = (a - dd * inv_e) * inv_e  # = (A − d dᵀ/e)/e, tile of W/e
        sym = jnp.where(j > i, 2.0, 1.0)  # off-diagonal tiles stand for two

        for ki, pc in enumerate(p_counts):
            c_i = c_refs[2 * ki][0]  # [P_PAD, TI]
            c_j = c_refs[2 * ki + 1][0]  # [P_PAD, TJ]
            best = c_i[0][:, None] * c_j[0][None, :]
            best_p = jnp.zeros((ti, tj), jnp.int32)
            for pi in range(1, pc):  # actual prototype count, unrolled
                term = c_i[pi][:, None] * c_j[pi][None, :]
                take = term > best
                best = jnp.where(take, term, best)
                best_p = jnp.where(take, pi, best_p)
            delta = jnp.tanh(best * inv_temp)

            s1_ref, q_ref, dc_ref = out_refs[3 * ki : 3 * ki + 3]
            s1_ref[0, 0, 0] += sym * jnp.sum(a * delta)
            q_ref[0, 0, 0] += sym * jnp.sum(delta * dd)
            w = a_m_dd * ((1.0 - delta * delta) * inv_temp)
            if DC_MODE == "none":
                continue
            if DC_MODE == "vpu":
                # ONE masked-w select per prototype feeds BOTH the row-side
                # (dC[p, I] += 2 Σ_J m·c_j[p, J]) and the transposed
                # col-side (dC[p, J] += 2 Σ_I m·c_i[p, I]) reductions; the
                # col side is computed unconditionally (diagonal tiles are
                # ~nb of ~nb²/2 — cheaper than re-masking under the branch)
                # and only its WRITE is guarded.
                rows, cols = [], []
                for pi in range(pc):
                    m = jnp.where(best_p == pi, w, 0.0)
                    rows.append(
                        2.0
                        * jnp.sum(
                            m * c_j[pi][None, :], axis=1, dtype=jnp.float32
                        )[None, :]
                    )
                    cols.append(
                        2.0
                        * jnp.sum(
                            m * c_i[pi][:, None], axis=0, dtype=jnp.float32
                        )[None, :]
                    )
                dc = jnp.concatenate(
                    rows + [jnp.zeros((_P_PAD - pc, ti), jnp.float32)], axis=0
                )
                dc_t = jnp.concatenate(
                    cols + [jnp.zeros((_P_PAD - pc, tj), jnp.float32)], axis=0
                )
                dc_ref[0, :, pl.ds(i * ti, ti)] += dc

                @pl.when(j > i)
                def _():
                    dc_ref[0, :, pl.ds(j * tj, tj)] += dc_t

                continue

            # DC_MODE == "mxu": per-prototype [ti,tj]x[tj,1] matvecs (the
            # N=1 padding wastes 127/128 of the MXU; kept for A/B only)
            def _dc_rows(c_other, contract_axis):
                red = [
                    2.0
                    * jax.lax.dot_general(
                        jnp.where(best_p == pi, w, 0.0),
                        c_other[pi][:, None],
                        (((contract_axis,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).T
                    for pi in range(pc)
                ]
                other = ti if contract_axis == 1 else tj
                return jnp.concatenate(
                    red + [jnp.zeros((_P_PAD - pc, other), jnp.float32)],
                    axis=0,
                )

            dc_ref[0, :, pl.ds(i * ti, ti)] += _dc_rows(c_j, 1)  # [P_PAD, TI]

            @pl.when(j > i)
            def _():
                # transposed contribution: dC[p, J] += 2 Σ_I w·1[argmax=p]·c_i
                dc_ref[0, :, pl.ds(j * tj, tj)] += _dc_rows(c_i, 0)


_DEG_TBLOCK = 1024  # deg sweep tile (few live intermediates -> larger than
# _BLOCK; 1024 measured 2.16 vs 2.43 ms at 512, and 2048 exceeds VMEM)


def _deg_kernel(il_ref, jl_ref, nvb_ref, x_i_ref, x_j_ref, deg_ref):
    """Symmetric degree sweep: each upper-triangle (i, j) tile contributes
    its row sums to deg[I] and (for j > i) its column sums to deg[J].  The
    diagonal is zeroed inside the adjacency tile, so no self-term
    correction is needed (exact even with bf16 operands)."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    i, j = il_ref[t], jl_ref[t]
    ti, tj = x_i_ref.shape[1], x_j_ref.shape[1]
    nvb = nvb_ref[pl.program_id(0)]

    @pl.when(t == 0)
    def _():
        deg_ref[:] = jnp.zeros_like(deg_ref)

    @pl.when(jnp.logical_and(i < nvb, j < nvb))
    def _():
        a = jax.nn.relu(
            jax.lax.dot_general(
                x_i_ref[0], x_j_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        rows = i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
        cols = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        a = jnp.where(rows != cols, a, 0.0)
        deg_ref[0, 0, pl.ds(i * ti, ti)] += jnp.sum(
            a, axis=1, dtype=jnp.float32
        )

        @pl.when(j > i)
        def _():
            deg_ref[0, 0, pl.ds(j * tj, tj)] += jnp.sum(
                a, axis=0, dtype=jnp.float32
            )


def _deg_pallas(norm_x, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n0, d = norm_x.shape
    blk = _DEG_TBLOCK
    x = _pad_axis(norm_x, 1, blk)
    n = x.shape[1]
    nb = n // blk
    nvb = (-(-_valid_lengths(norm_x) // blk)).astype(jnp.int32)
    il, jl = _triangle_lists(nb)
    ntri = il.size
    il, jl = jnp.asarray(il), jnp.asarray(jl)

    x_i_spec = pl.BlockSpec(
        (1, blk, d),
        lambda bi, t, il, jl, nvb: (bi, _clamp_block(il[t], nvb[bi]), 0),
    )
    x_j_spec = pl.BlockSpec(
        (1, blk, d),
        lambda bi, t, il, jl, nvb: (bi, _clamp_block(jl[t], nvb[bi]), 0),
    )

    deg = pl.pallas_call(
        _deg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, ntri),
            in_specs=[x_i_spec, x_j_spec],
            out_specs=pl.BlockSpec(
                (1, 1, n), lambda bi, t, il, jl, nvb: (bi, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        interpret=interpret,
    )(il, jl, nvb, x, x)
    return deg[:, 0, :n0]


def _valid_lengths(norm_x):
    """Per-slide count covering every non-zero row (masked rows are zero)."""
    row = jnp.sum(jnp.abs(norm_x), axis=2) > 0  # [B, N]
    n = norm_x.shape[1]
    last = n - jnp.argmax(row[:, ::-1], axis=1)
    return jnp.where(jnp.any(row, axis=1), last, 0).astype(jnp.int32)


def _triangle_lists(nb: int):
    """Upper-triangle (i, j) tile lists, i-major so the x_i block stays
    resident across each row's sweep."""
    import numpy as np

    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    il = np.asarray([p[0] for p in pairs], np.int32)
    jl = np.asarray([p[1] for p in pairs], np.int32)
    return il, jl


_DEG_BLOCK = 2000  # row block of the XLA degree sweep


def _deg_xla(norm_x):
    """Degree vector deg_i = Σ_{j≠i} relu(x̂_i·x̂_j) via a blocked XLA scan:
    fused matmul+relu+rowsum over full row stripes, then subtract the
    diagonal (x̂_i·x̂_i = 1 on every valid row, 0 on masked rows).

    Kept as the ``DEG_MODE="xla"`` fallback: it beat round-2's row-resident
    [1, N] pallas accumulation (3.3 vs 3.8 ms) but loses to the round-3
    symmetric triangular sweep above (2.44 vs 2.16 ms), which avoids
    round-tripping the [B, block, N] stripes through HBM."""
    b, n, d = norm_x.shape
    x = _pad_axis(norm_x, 1, _DEG_BLOCK)
    nb = x.shape[1] // _DEG_BLOCK
    xb = jnp.moveaxis(x.reshape(b, nb, _DEG_BLOCK, d), 1, 0)
    rhs = norm_x

    def step(_, x_blk):
        a = jax.nn.relu(
            jnp.einsum(
                "brd,bnd->brn", x_blk, rhs,
                preferred_element_type=jnp.float32,
            )
        )
        return None, a.sum(axis=2)

    _, degs = lax.scan(step, None, xb)
    deg = jnp.moveaxis(degs, 0, 1).reshape(b, -1)[:, :n]
    row = (jnp.sum(jnp.abs(norm_x), axis=2) > 0).astype(jnp.float32)
    return deg - row


def _pallas_passes(norm_x, Cs, temp, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n0, d = norm_x.shape
    x = _pad_axis(norm_x, 1, _BLOCK)
    n = x.shape[1]
    nb = n // _BLOCK
    p_counts = tuple(C.shape[1] for C in Cs)
    Cps = [_pad_axis(_pad_axis(C, 1, _P_PAD), 2, _BLOCK) for C in Cs]
    nvb = -(-_valid_lengths(norm_x) // _BLOCK)  # valid BLOCK count per slide
    il, jl = _triangle_lists(nb)
    ntri = il.size
    il, jl = jnp.asarray(il), jnp.asarray(jl)

    # scalar-prefetched triangular grid: (bi, t) with t enumerating only
    # j >= i tiles — index maps read the prefetched lists, so below-diagonal
    # tiles are never DMA'd at all; indices clamp to the slide's last valid
    # block (_clamp_block), so compute-skipped tiles past the valid length
    # repeat a resident block and move no data either
    smem11 = pl.BlockSpec(
        (1, 1, 1),
        lambda bi, t, il, jl, nvb: (bi, 0, 0),
        memory_space=pltpu.SMEM,
    )
    x_i_spec = pl.BlockSpec(
        (1, _BLOCK, d),
        lambda bi, t, il, jl, nvb: (bi, _clamp_block(il[t], nvb[bi]), 0),
    )
    x_j_spec = pl.BlockSpec(
        (1, _BLOCK, d),
        lambda bi, t, il, jl, nvb: (bi, _clamp_block(jl[t], nvb[bi]), 0),
    )
    c_i_spec = pl.BlockSpec(
        (1, _P_PAD, _BLOCK),
        lambda bi, t, il, jl, nvb: (bi, 0, _clamp_block(il[t], nvb[bi])),
    )
    c_j_spec = pl.BlockSpec(
        (1, _P_PAD, _BLOCK),
        lambda bi, t, il, jl, nvb: (bi, 0, _clamp_block(jl[t], nvb[bi])),
    )
    deg_spec = pl.BlockSpec(
        (1, 1, n), lambda bi, t, il, jl, nvb: (bi, 0, 0)
    )

    deg_vec = (
        _deg_pallas(norm_x, interpret=interpret)
        if DEG_MODE == "pallas"
        else _deg_xla(norm_x)
    )
    deg = _pad_axis(deg_vec, 1, _BLOCK)[:, None, :]  # [B, 1, n]

    e = jnp.maximum(deg.sum(axis=(1, 2)), 1e-12)
    inv_e = (1.0 / e)[:, None, None]

    outs = pl.pallas_call(
        functools.partial(
            _combined_kernel, inv_temp=1.0 / temp, p_counts=p_counts
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, ntri),
            in_specs=[x_i_spec, x_j_spec]
            + [spec for _ in Cs for spec in (c_i_spec, c_j_spec)]
            + [deg_spec, smem11],
            out_specs=tuple(
                spec
                for _ in Cs
                for spec in (
                    smem11,
                    smem11,
                    # full-width dC block (like deg): the symmetric sweep
                    # writes both slice i (row side) and slice j (col side)
                    # every step, so the block stays resident throughout
                    pl.BlockSpec(
                        (1, _P_PAD, n),
                        lambda bi, t, il, jl, nvb: (bi, 0, 0),
                    ),
                )
            ),
        ),
        out_shape=tuple(
            shp
            for _ in Cs
            for shp in (
                jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, _P_PAD, n), jnp.float32),
            )
        ),
        interpret=interpret,
        # the combined kernel's working set slightly exceeds the default
        # 16 MiB scoped-vmem budget when embedded in the train step (16.09M
        # at _BLOCK=512 with the VPU dC reductions; more at 640) — raise the
        # per-kernel scoped limit unconditionally (v5e VMEM is 128 MiB)
        **(
            {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024
                )
            }
            if not interpret
            else {}
        ),
    )(
        il, jl, nvb.astype(jnp.int32), x, x,
        *[cc for Cp in Cps for cc in (Cp, Cp)], deg, inv_e,
    )

    traces, dCs = [], []
    for ki, C in enumerate(Cs):
        s1 = outs[3 * ki][:, 0, 0]
        q = outs[3 * ki + 1][:, 0, 0]
        traces.append((s1 - q / e) / e)
        dCs.append(outs[3 * ki + 2][:, : C.shape[1], :n0])
    return tuple(traces), tuple(dCs)


# ===========================================================================
# XLA scan backend (CPU tests / fallback): same 2-pass structure
# ===========================================================================


def _row_blocks(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, N, ...] -> [nb, B, block, ...] with zero row padding."""
    b, n = x.shape[:2]
    x = _pad_axis(x, 1, block)
    nb = x.shape[1] // block
    x = x.reshape((b, nb, block) + x.shape[2:])
    return jnp.moveaxis(x, 1, 0)


def _adjacency_block(x_blk, norm_x, idx_blk, n):
    """Cosine-adjacency row tile A[I, :] = clip(x̂_I x̂ᵀ, 0), zero diagonal,
    zero padded rows/columns."""
    a = jax.nn.relu(
        jnp.einsum(
            "brd,bnd->brn", x_blk, norm_x, preferred_element_type=jnp.float32
        )
    )
    col = jnp.arange(n)
    return a * (idx_blk[:, None] != col[None, :])


def _cc_max_block(c_blk, C):
    """Running max over prototypes of the rank-1 assignment products and its
    argmax: cc[I, j] = max_p C[p, I] C[p, j] (tile [B, R, N])."""
    p_count = C.shape[1]
    best = c_blk[:, 0, :, None] * C[:, 0, None, :]
    best_p = jnp.zeros(best.shape, jnp.int32)
    for pi in range(1, p_count):  # P is tiny (6-7); unrolled
        term = c_blk[:, pi, :, None] * C[:, pi, None, :]
        take = term > best
        best = jnp.where(take, term, best)
        best_p = jnp.where(take, pi, best_p)
    return best, best_p


def _scan_passes(norm_x, Cs, temp):
    b, n, _ = norm_x.shape
    xb = _row_blocks(norm_x, _BLOCK)  # [nb, B, R, D]
    cbs = [_row_blocks(jnp.moveaxis(C, 1, 2), _BLOCK) for C in Cs]
    idx = jnp.arange(xb.shape[0] * _BLOCK).reshape(xb.shape[0], _BLOCK)

    def deg_step(_, inp):
        x_blk, idx_blk = inp
        a = _adjacency_block(x_blk, norm_x, idx_blk, n)
        return None, a.sum(axis=2, dtype=jnp.float32)

    _, degs = lax.scan(deg_step, None, (xb, idx))  # [nb, B, R]
    deg = jnp.moveaxis(degs, 0, 1).reshape(b, -1)[:, :n]
    e = jnp.maximum(deg.sum(axis=1), 1e-12)
    deg_pad = jnp.pad(deg, ((0, 0), (0, idx.size - n)))
    inv_e = (1.0 / e)[:, None, None]
    inv_temp = 1.0 / temp

    def main_step(carry, inp):
        x_blk, idx_blk = inp[0], inp[1]
        c_blks = inp[2:]
        a = _adjacency_block(x_blk, norm_x, idx_blk, n)
        deg_blk = jnp.take_along_axis(deg_pad, idx_blk[None, :], axis=1)
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

    zeros = jnp.zeros((b,), jnp.float32)
    carry, dcs = lax.scan(
        main_step, tuple(zeros for _ in range(2 * len(Cs))), (xb, idx, *cbs)
    )
    traces, dCs = [], []
    for ki in range(len(Cs)):
        s1, q = carry[2 * ki], carry[2 * ki + 1]
        traces.append((s1 - q / e) / e)
        dCs.append(jnp.concatenate(list(dcs[ki]), axis=2)[:, :, :n])
    return tuple(traces), tuple(dCs)


# ===========================================================================
# custom_vjp plumbing
# ===========================================================================


def _traces_and_grads(norm_x, Cs, temp):
    if jax.default_backend() == "tpu":
        return _pallas_passes(norm_x, Cs, temp)
    return _scan_passes(norm_x, Cs, temp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _modularity_traces(temp: float, norm_x: jnp.ndarray, *Cs: jnp.ndarray):
    """trace_b((W/e) · δ_k) per prototype set k, sharing the adjacency work.

    W = A − d dᵀ/e, δ_k = tanh(max_p Cₖᵖ Cₖᵖᵀ / τ).  norm_x: [B, N, D]
    L2-normalized (masked rows zero) — non-differentiable (the call site
    stop-gradients the bag).  Each C: [B, P, N] clipped assignment.
    Returns a tuple of [B] traces.
    """
    traces, _ = _traces_and_grads(norm_x, Cs, temp)
    return traces


def _modularity_traces_fwd(temp, norm_x, *Cs):
    traces, dCs = _traces_and_grads(norm_x, Cs, temp)
    return traces, dCs


def _modularity_traces_bwd(temp, res, gts):
    grads = tuple(
        gt[:, None, None].astype(dC.dtype) * dC for gt, dC in zip(gts, res)
    )
    return (None,) + grads


_modularity_traces.defvjp(_modularity_traces_fwd, _modularity_traces_bwd)


def _prepare(c_list, x, valid):
    x = jax.lax.stop_gradient(x)

    # normalization + assignment in fp32 (numerics-sensitive; cheap at O(ND))
    norm_x = _l2_normalize(x.astype(jnp.float32), axis=2)
    if valid is not None:
        norm_x = norm_x * valid[..., None]

    # cluster assignment with the reference's per-feature prototype norm:
    # C[b,p,n] = clip(Σ_d norm_x[b,n,d] · c[b,p,d]/||c[b,:,d]||, 0)
    Cs = []
    for c in c_list:
        norm_c = c.astype(jnp.float32)
        norm_c = norm_c / jnp.maximum(
            jnp.linalg.norm(norm_c, axis=1, keepdims=True), 1e-12
        )
        Cs.append(
            jax.nn.relu(
                jnp.einsum(
                    "bnd,bpd->bpn", norm_x, norm_c,
                    preferred_element_type=jnp.float32,
                )
            )
        )
    return norm_x, Cs


def compute_modularity(
    c: jnp.ndarray,  # [B, P, D] prototypes / cluster tokens
    x: jnp.ndarray,  # [B, N, D] bag tokens
    valid: Optional[jnp.ndarray] = None,  # [B, N] bool
    temp: float = 0.1,
) -> jnp.ndarray:
    """Batched modularity score; returns a scalar (mean over batch) matching
    ``mean_b(-trace_b) * 100`` of per-slide reference calls."""
    norm_x, Cs = _prepare((c,), x, valid)
    (trace,) = _modularity_traces(float(temp), norm_x, *Cs)
    return -jnp.mean(trace) * 100.0


def compute_modularity_pair(
    c_list: Sequence[jnp.ndarray],  # K x [B, P_k, D]
    x: jnp.ndarray,  # [B, N, D] shared bag
    valid: Optional[jnp.ndarray] = None,
    temp: float = 0.1,
) -> jnp.ndarray:
    """Sum of ``compute_modularity(c, x, valid)`` over prototype sets that
    share one bag — the adjacency matmul and the degree pass run once for
    all sets (the model's two terms, ref ``umeml_gan.py:516-526``)."""
    norm_x, Cs = _prepare(tuple(c_list), x, valid)
    traces = _modularity_traces(float(temp), norm_x, *Cs)
    return sum(-jnp.mean(t) * 100.0 for t in traces)
