"""Patch-encode throughput decomposition for the CLIP vision towers.

Separates the three candidate bottlenecks of the extraction pipeline
(reference ``tools/clip_feature.py:24-68`` — its serial 1-patch-per-forward
loop is replaced by ``tools/clip_feature.py`` here):

1. ``device``  — pure device compute: weights + a resident uint8 batch,
   chained through a data dependency, host readback only at the end.
2. ``h2d``     — adds a fresh host->device upload per batch (uint8 NHWC,
   4x smaller than the fp32 upload the r1 pipeline shipped).
3. ``pipeline``— the real tool loop: synthetic host batches through the
   producer-queue + lag-2 readback of ``tools/clip_feature.py``.

All timings follow the tunnel protocol (untimed burn-in, data-dependency
chaining, final readback — .claude/skills/verify/SKILL.md).  Prints
patches/sec and achieved TFLOP/s against the analytic ViT FLOPs.

Usage::

    python tools/bench_vit.py [--model ViT-B/16] [--prec fp32|bf16]
        [--batch-size 256] [--iters 10] [--stage device|h2d|pipeline|all]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def vit_flops_per_image(name: str) -> float:
    """Analytic forward FLOPs (mult-adds x2) of the vision tower."""
    from imp_tpu.models.clip import CLIP_CONFIGS

    c = CLIP_CONFIGS[name]
    w, layers = c["vision_width"], c["vision_layers"]
    if not isinstance(layers, int):  # ResNet towers: not supported here
        raise SystemExit("bench_vit supports ViT towers only")
    res, patch = c["image_resolution"], c["vision_patch_size"]
    n = (res // patch) ** 2 + 1
    per_layer = (
        4 * n * w * w * 2  # qkv + out proj
        + 2 * n * n * w * 2  # scores + weighted sum
        + 8 * n * w * w * 2  # mlp
    )
    conv = n * (patch * patch * 3) * w * 2
    proj = w * c["embed_dim"] * 2
    return float(layers * per_layer + conv + proj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B/16")
    ap.add_argument("--prec", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stage", default="all",
                    choices=["device", "h2d", "pipeline", "all"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_feature import device_normalize
    from imp_tpu.models.clip import CLIP_CONFIGS, build_vision_tower

    model = build_vision_tower(args.model)
    size = CLIP_CONFIGS[args.model]["image_resolution"]
    cdtype = jnp.bfloat16 if args.prec == "bf16" else jnp.float32
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )
    if args.prec == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )

    bs = args.batch_size
    flops = vit_flops_per_image(args.model) * bs
    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, (bs, size, size, 3), dtype=np.uint8)

    @jax.jit
    def encode(p, x_u8):
        return model.apply(p, device_normalize(x_u8, cdtype)).astype(
            jnp.float32
        )

    def report(stage, dt_per_batch):
        pps = bs / dt_per_batch
        tf = flops / dt_per_batch / 1e12
        print(
            f"{stage:10s} {args.model} {args.prec} bs={bs}: "
            f"{pps:,.0f} patches/s  {tf:.1f} TFLOP/s "
            f"({dt_per_batch*1e3:.2f} ms/batch)",
            flush=True,
        )

    if args.stage in ("device", "all"):
        # chain through a scalar folded into the batch so iterations
        # serialize on device; single readback at the end.  params and the
        # batch are ARGUMENTS (a closure would bake the 350 MB of weights
        # into the compile payload and overflow the tunnel's request limit)
        dev_u8 = jnp.asarray(host_u8)

        @jax.jit
        def step(p, x_u8, carry):
            out = encode(p, jnp.bitwise_xor(x_u8, carry))
            return (out[0, 0] != 0).astype(jnp.uint8)

        c = jnp.uint8(0)
        for _ in range(4):
            c = step(params, dev_u8, c)
        int(c)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c = step(params, dev_u8, c)
        int(c)
        report("device", (time.perf_counter() - t0) / args.iters)

    if args.stage in ("h2d", "all"):
        outs = []
        for _ in range(3):  # burn-in
            outs.append(encode(params, jnp.asarray(host_u8)))
        float(outs[-1].sum())
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.iters):
            outs.append(encode(params, jnp.asarray(host_u8)))
        _ = [float(o[0, 0]) for o in outs]
        report("h2d", (time.perf_counter() - t0) / args.iters)

    if args.stage in ("pipeline", "all"):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=4)
        n_batches = args.iters * 2

        def producer():
            for _ in range(n_batches):
                q.put(host_u8.copy())  # fresh host buffer per batch
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        got, inflight = 0, []
        t0 = time.perf_counter()
        while True:
            item = q.get()
            if item is None:
                break
            inflight.append(encode(params, jnp.asarray(item)))
            if len(inflight) > 2:
                _ = np.asarray(inflight.pop(0))
                got += 1
        for o in inflight:
            _ = np.asarray(o)
            got += 1
        report("pipeline", (time.perf_counter() - t0) / got)
        t.join()


if __name__ == "__main__":
    main()
