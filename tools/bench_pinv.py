"""Validate + time the fused Pallas Newton-Schulz pinv vs the XLA chain.

Usage (TPU):  python tools/bench_pinv.py --check [--g 16] [--m 128]

--check asserts forward AND gradient parity between
``imp_tpu.ops.pinv_kernel.pinv_newton_schulz`` and the unrolled XLA
implementation on softmax-distributed inputs (the shapes/distribution the
Nyström layers feed it), then times both.
"""

from __future__ import annotations

import argparse
import sys
import time
import os.path as osp

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def xla_pinv(x, iters=6):
    from imp_tpu.ops import attention as att

    old = att.PINV_MODE
    att.PINV_MODE = "xla"
    try:
        return att.moore_penrose_pinv(x, iters)
    finally:
        att.PINV_MODE = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=16)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--timing-iters", type=int, default=30)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from imp_tpu.ops.pinv_kernel import pinv_newton_schulz as moore_penrose_pinv

    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    # softmax-row-stochastic inputs, like the Nystrom attn2 matrices
    logits = jax.random.normal(key, (args.g, args.m, args.m), jnp.float32)
    x = jax.nn.softmax(logits, axis=-1)
    cot = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)

    def loss_of(pinv_fn):
        def loss(x):
            return jnp.sum(pinv_fn(x, args.iters) * cot)

        return loss

    f_pal = jax.jit(lambda x: moore_penrose_pinv(x, args.iters))
    f_xla = jax.jit(lambda x: xla_pinv(x, args.iters))
    g_pal = jax.jit(jax.grad(loss_of(moore_penrose_pinv)))
    g_xla = jax.jit(jax.grad(loss_of(xla_pinv)))

    if args.check:
        zp = np.asarray(f_pal(x))
        zx = np.asarray(f_xla(x))
        scale = np.abs(zx).max() + 1e-30
        err_f = np.abs(zp - zx).max() / scale
        gp = np.asarray(g_pal(x))
        gx = np.asarray(g_xla(x))
        gscale = np.abs(gx).max() + 1e-30
        err_g = np.abs(gp - gx).max() / gscale
        print(f"fwd  max-rel-err vs XLA: {err_f:.3e} (|z|max {scale:.3e})")
        print(f"grad max-rel-err vs XLA: {err_g:.3e} (|g|max {gscale:.3e})")
        assert err_f < 2e-4, f"forward mismatch: {err_f}"
        assert err_g < 2e-3, f"gradient mismatch: {err_g}"
        # sanity: the result actually inverts (A pinv(A) A ~ A)
        rec = np.asarray(jnp.einsum("gij,gjk,gkl->gil", x, f_pal(x), x))
        print("||A Z A - A||_max:", np.abs(rec - np.asarray(x)).max())
        print("CHECK OK")

    def bench(fn, tag):
        # burn-in (first timed run in a process reads slow through the tunnel)
        for _ in range(6):
            float(jnp.sum(fn(x)))
        n = args.timing_iters
        t0 = time.perf_counter()
        acc = x
        for _ in range(n):
            acc = fn(acc * 0 + x)  # chain through data dependency
        float(jnp.sum(acc))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag}: {dt:.3f} ms/call  (g={args.g}, m={args.m})")

    bench(f_pal, "pallas fwd    ")
    bench(f_xla, "xla    fwd    ")
    bench(g_pal, "pallas fwd+bwd")
    bench(g_xla, "xla    fwd+bwd")


if __name__ == "__main__":
    main()
