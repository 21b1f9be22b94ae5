"""Fused Newton-Schulz Moore-Penrose pseudo-inverse (TPU Pallas).

The Nyström attention layers (reference ``nystrom-attention``'s
``ops/utils.py:116-131`` iteration, re-implemented in
:func:`imp_tpu.ops.attention.moore_penrose_pinv`) spend their time in an
UNROLLED 6-step iteration of four [.., m, m] matmuls each.  At the UMEML
head's shapes (m = 128, batch·heads = 16-32 programs) every one of those
~24 matmuls is a separate sub-microsecond XLA thunk — the step cost is
per-op overhead, not FLOPs (measured ~10-30 µs/op on this chip,
BASELINE.md r3 "dispatch-overhead corollary").  This kernel runs the whole
iteration — and its hand-derived reverse-mode chain — as ONE Pallas
program per (batch, head) matrix, so the 6 TransLayer calls of the
flagship train step dispatch 2 kernels each instead of ~70 thunks.

Numerics: identical arithmetic to the XLA path — z₀ = xᵀ/c with the
reference's GLOBAL normalizer c = max(colsums)·max(rowsums) (computed in
XLA outside the kernel, since it couples all programs), the same Horner
chain per iteration, all dots in true-fp32 (``Precision.HIGHEST`` — the
Newton-Schulz iteration diverges under the TPU's default bf16 passes).
The backward differentiates the unrolled iteration itself (storing the
per-iteration z_i in VMEM scratch), matching torch autograd's gradient of
the reference implementation; the normalizer's max-gradient path is
handled by ``jax.vjp`` of the (tiny) XLA normalizer in the epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _norm_scalar(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's global pinv normalizer: max over ALL batch/head dims
    of the absolute column sums times the same of the row sums."""
    abs_x = jnp.abs(x)
    col = abs_x.sum(axis=-1)
    row = abs_x.sum(axis=-2)
    return jnp.max(col) * jnp.max(row)


def _eye_mask(m: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return (r == c).astype(jnp.float32)


def _iterate(x, z, eye):
    """One Newton-Schulz step: z <- 0.25 z (13I - y(15I - y(7I - y))),
    y = x z — the exact Horner chain of the XLA implementation.  Returns
    (z_next, residuals-for-backward)."""
    y = _dot(x, z)
    t1 = 7.0 * eye - y
    t2 = _dot(y, t1)
    t3 = 15.0 * eye - t2
    t4 = _dot(y, t3)
    m_ = 13.0 * eye - t4
    z_next = 0.25 * _dot(z, m_)
    return z_next, (y, t1, t3, m_)


def _fwd_kernel(iters, c_ref, x_ref, z_ref):
    x = x_ref[0]
    c = c_ref[0, 0]
    eye = _eye_mask(x.shape[-1])
    z = x.T / c
    for _ in range(iters):
        z, _ = _iterate(x, z, eye)
    z_ref[0] = z


def _bwd_kernel(iters, c_ref, x_ref, g_ref, dx_ref, dcp_ref, zs_ref):
    x = x_ref[0]
    c = c_ref[0, 0]
    eye = _eye_mask(x.shape[-1])

    # forward replay, stashing z_i (the pre-iteration iterates) in VMEM
    z = x.T / c
    for i in range(iters):
        zs_ref[i] = z
        z, _ = _iterate(x, z, eye)

    # reverse sweep: adjoint of each Horner chain
    dz = g_ref[0]
    dx = jnp.zeros_like(x)
    for i in range(iters - 1, -1, -1):
        zi = zs_ref[i]
        _, (y, t1, t3, m_) = _iterate(x, zi, eye)
        dzi = 0.25 * _dot(dz, m_.T)  # z' = 0.25 z m
        dm = 0.25 * _dot(zi.T, dz)
        dt4 = -dm  # m = 13I - t4
        dy = _dot(dt4, t3.T)  # t4 = y t3
        dt3 = _dot(y.T, dt4)
        dt2 = -dt3  # t3 = 15I - t2
        dy = dy + _dot(dt2, t1.T)  # t2 = y t1
        dt1 = _dot(y.T, dt2)
        dy = dy - dt1  # t1 = 7I - y
        dx = dx + _dot(dy, zi.T)  # y = x z_i
        dz = dzi + _dot(x.T, dy)

    # z0 = x.T / c
    dx = dx + dz.T / c
    dx_ref[0] = dx
    from jax.experimental import pallas as pl

    dcp_ref[pl.program_id(0), 0] = -jnp.sum(x.T * dz) / (c * c)


def _fwd_call(x: jnp.ndarray, c: jnp.ndarray, iters: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, m, _ = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, iters),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m, m), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, m, m), jnp.float32),
    )(c.reshape(1, 1), x)


def _bwd_call(x, c, g_out, iters):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, m, _ = x.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel, iters),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m, m), lambda i: (i, 0, 0)),
            # whole-array SMEM ref; each program writes row program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, m, m), jnp.float32),
            jax.ShapeDtypeStruct((g, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((iters, m, m), jnp.float32)],
    )(c.reshape(1, 1), x, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pinv_ns(x: jnp.ndarray, iters: int) -> jnp.ndarray:
    c = _norm_scalar(x)
    return _fwd_call(x, c, iters)


def _pinv_ns_fwd(x, iters):
    c = _norm_scalar(x)
    return _fwd_call(x, c, iters), (x, c)


def _pinv_ns_bwd(iters, res, g_out):
    x, c = res
    dx, dcp = _bwd_call(x, c, g_out, iters)
    dc = dcp.sum()
    # the normalizer's own gradient path (max over abs row/col sums) —
    # delegate to jax.vjp of the tiny XLA normalizer so tie-splitting
    # matches the non-kernel implementation exactly
    _, norm_vjp = jax.vjp(_norm_scalar, x)
    (dx_c,) = norm_vjp(dc)
    return (dx + dx_c,)


_pinv_ns.defvjp(_pinv_ns_fwd, _pinv_ns_bwd)


def pinv_newton_schulz(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Drop-in fused replacement for the XLA ``moore_penrose_pinv`` on TPU.

    x: [..., m, m] float32, m a multiple of 128 (the MXU lane tile).
    Returns pinv(x) with the same leading dims.
    """
    lead = x.shape[:-2]
    m = x.shape[-1]
    flat = x.reshape((-1, m, m))
    out = _pinv_ns(flat, iters)
    return out.reshape(*lead, m, m)
