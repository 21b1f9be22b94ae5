"""Interleaved in-process A/B of full-train-step variants on the TPU.

Cross-process bench readings vary ±15% through the tunnel (BASELINE.md
measurement notes), so code-level knobs are compared INSIDE one process
with interleaved timed slots and the first slot discarded.

Usage:
  python tools/ab_step.py --knob head_fused      # HEAD_FUSED True vs False
  python tools/ab_step.py --knob pinv            # PINV_MODE auto vs xla
  python tools/ab_step.py --knob none            # two identical arms (noise floor)

Each arm gets its own jitted step + donated state; arms alternate
A B A B ... for --slots slots of --iters steps each.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", default="head_fused",
                    choices=["head_fused", "pinv", "stacked", "prec",
                             "bagbf16", "none"])
    ap.add_argument("--slots", type=int, default=4, help="timed slots PER ARM")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=2)
    args = ap.parse_args()

    import jax

    from bench import build_step

    def set_knob(arm: str):
        if args.knob == "head_fused":
            import imp_tpu.models.umeml_gan as ug

            ug.HEAD_FUSED = arm == "A"
        elif args.knob == "pinv":
            from imp_tpu.ops import attention as att

            att.PINV_MODE = "pallas" if arm == "A" else "xla"
        elif args.knob == "stacked":
            import importlib

            ug = importlib.import_module("imp_tpu.models.umeml_gan")
            ug.STACKED_PAIRS = arm == "A"
        elif args.knob == "bagbf16":
            # A = bag-activations-only bf16 (params/losses/pinv/modularity
            # stay fp32 — umeml_gan.BAG_DTYPE), B = all-fp32
            import jax.numpy as jnp

            import imp_tpu.models.umeml_gan as ug

            ug.BAG_DTYPE = jnp.bfloat16 if arm == "A" else None

    print(f"knob={args.knob}  A=on/fused  B=off/xla  backend={jax.default_backend()}")

    steps, states, batches = {}, {}, {}
    for arm in ("A", "B"):
        set_knob(arm)
        # knob "prec": A = full-bf16 forward/backward (TRAINER.PREC=bf16),
        # B = fp32 — an arm-level build arg rather than a module global
        prec = "bf16" if (args.knob == "prec" and arm == "A") else "fp32"
        step, state, batch = build_step(
            batch_size=args.batch_size, prec=prec)
        # trace/compile NOW, while the knob is set for this arm
        keys = jax.random.split(jax.random.PRNGKey(ord(arm)), 200)
        state, loss = step(state, batch, keys[0], 0.1)
        _ = float(loss)
        steps[arm], states[arm], batches[arm] = step, state, batch

    # burn-in both arms (first executions upload executables through the
    # tunnel and read ~10x slow)
    keys = jax.random.split(jax.random.PRNGKey(99), 2000)
    ki = 0
    for _ in range(6):
        for arm in ("A", "B"):
            states[arm], loss = steps[arm](
                states[arm], batches[arm], keys[ki], 0.1)
            ki += 1
        _ = float(loss)

    results = {"A": [], "B": []}
    for s in range(args.slots):
        for arm in ("A", "B"):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                states[arm], loss = steps[arm](
                    states[arm], batches[arm], keys[ki], 0.1)
                ki += 1
            _ = float(loss)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            results[arm].append(dt)
            print(f"slot {s} arm {arm}: {dt:.2f} ms/step")

    for arm in ("A", "B"):
        r = results[arm][1:] if len(results[arm]) > 1 else results[arm]
        print(
            f"arm {arm}: best {min(r):.2f}  median {sorted(r)[len(r)//2]:.2f} "
            f" all(after slot0) {['%.2f' % x for x in r]}"
        )


if __name__ == "__main__":
    main()
