"""Flash-attention kernel micro-benchmark at the TransLayer envelope
(10k-token bags, d_head=32 — ``data_manager.py:387`` / UMEML hidden 256).

Prints TFLOP/s for the Pallas kernel at each requested precision. Timing
forces a host readback of a value depending on every iteration (the tunnel
makes block_until_ready unreliable — see .claude/skills/verify/SKILL.md).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10240)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--valid-frac", type=float, default=1.0,
                    help="fraction of keys unmasked (ragged-bag skipping)")
    ap.add_argument("--block-q", type=int, default=256)
    ap.add_argument("--block-k", type=int, default=512)
    ap.add_argument("--precisions", default="bf16,fp32")
    ap.add_argument("--check", action="store_true",
                    help="compare against XLA dense attention (use small --n)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imp_tpu.ops.flash_attention import flash_attention

    b, h, n, d = args.batch, args.heads, args.n, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    n_valid = int(n * args.valid_frac)
    mask = jnp.asarray(np.arange(n)[None, :] < n_valid).repeat(b, 0)

    flops = 4 * b * h * n * n_valid * d  # 2 matmuls over valid keys

    if args.check:
        from imp_tpu.ops.attention import dense_attention

        def dense_loss(q, k, v, m):
            out, _, _ = dense_attention(q * (d**-0.5), k, v, key_valid=m, scale=1.0)
            return jnp.sum(out * jnp.cos(out)), out

        (want_l, want), want_g = jax.jit(
            jax.value_and_grad(dense_loss, argnums=(0, 1, 2), has_aux=True)
        )(q, k, v, mask)
        want = np.asarray(want)
        for prec in args.precisions.split(","):

            def flash_loss(q, k, v, m, _p=prec):
                out = flash_attention(
                    q, k, v, mask=m, mxu_precision=_p,
                    block_q=args.block_q, block_k=args.block_k,
                )
                return jnp.sum(out * jnp.cos(out)), out

            (_, got), got_g = jax.jit(
                jax.value_and_grad(flash_loss, argnums=(0, 1, 2), has_aux=True)
            )(q, k, v, mask)
            got = np.asarray(got)
            err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
            gerrs = [
                float(np.max(np.abs(np.asarray(gg) - np.asarray(gw)))
                      / (np.max(np.abs(np.asarray(gw))) + 1e-9))
                for gg, gw in zip(got_g, want_g)
            ]
            print(
                f"check {prec}: fwd max rel err vs dense = {err:.2e}; "
                f"dq/dk/dv rel err = "
                + "/".join(f"{e:.2e}" for e in gerrs)
            )

    for prec in args.precisions.split(","):
        fn = jax.jit(
            lambda q, k, v, m, _p=prec: flash_attention(
                q, k, v, mask=m, mxu_precision=_p,
                block_q=args.block_q, block_k=args.block_k,
            )
        )
        out = fn(q, k, v, mask)
        _ = float(out.sum())  # compile + settle
        # burn-in: the first post-compile steps through the tunnel run ~10x
        # slow (executable upload / device cold start) — time only after a
        # full untimed loop
        for _i in range(3):
            out = fn(q, k, v, mask)
        _ = float(out.sum())
        t0 = time.perf_counter()
        acc = None
        for i in range(args.iters):
            out = fn(q + (acc if acc is not None else 0.0) * 0, k, v, mask)
            acc = out[0, 0, 0, :1]  # chain iterations via data dependency
        _ = float(acc.sum())
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"{prec}: {dt * 1e3:8.2f} ms  "
            f"{flops / dt / 1e12:6.2f} TFLOP/s  "
            f"(n={n}, d={d}, h={h}, b={b}, bq={args.block_q}, "
            f"bk={args.block_k}, valid={args.valid_frac:.0%})"
        )


if __name__ == "__main__":
    main()
