"""Offline WSI patch -> CLIP feature extraction, batched and jitted.

Replaces reference ``tools/clip_feature.py:24-68`` (which encodes ONE patch
per ``encode_image`` call, serially over slides — its #1 throughput
bottleneck) with a batched jit pipeline: fixed-size image batches stream
through the flax ViT on the accelerator while the host thread decodes the
next batch; per-slide features are written to ``.h5`` under the same key
(``clip_vit_b32_feature``).

Usage:
    python tools/clip_feature.py --src PATCH_ROOT --dst FEATURE_DIR \
        --checkpoint ViT-B-32.pt [--model ViT-B/32] [--batch-size 32]

``--random-weights`` runs without a checkpoint (throughput testing).
"""

import argparse
import os
import os.path as osp
import sys
import threading
import queue
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")


def preprocess(path: str, size: int, as_uint8: bool = False) -> np.ndarray:
    """resize(shorter=size, bicubic) -> center crop -> normalize
    (the reference uses clip.load()'s preprocess with the same steps).

    With ``as_uint8`` the normalize step is left to the device (see
    ``device_normalize``): the host emits raw uint8 pixels, quartering the
    host->device transfer and skipping two fp32 passes per pixel on the
    decode thread."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    if as_uint8:
        return np.asarray(img, np.uint8)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def device_normalize(x, dtype):
    """uint8 [B,H,W,3] -> normalized float on device (fused into the jitted
    encode; pixel math is a negligible VPU epilogue next to the ViT)."""
    import jax.numpy as jnp

    x = x.astype(dtype) / jnp.asarray(255.0, dtype)
    mean = jnp.asarray(CLIP_MEAN, dtype)
    std = jnp.asarray(CLIP_STD, dtype)
    return (x - mean) / std


def load_checkpoint_params(path: str, model_name: str):
    import torch

    from imp_tpu.models.clip import convert_torch_clip_state

    try:
        state = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        state = torch.jit.load(path, map_location="cpu").state_dict()
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    vparams, _ = convert_torch_clip_state(state, name=model_name)
    return vparams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="root dir of per-slide patch dirs")
    ap.add_argument("--dst", required=True, help="output h5 dir")
    ap.add_argument("--model", default="ViT-B/32")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--random-weights", action="store_true")
    # 32 is the measured single-chip sweet spot for the ViT towers: per-layer
    # activations stay cache-resident, 129.5 TFLOP/s bf16 on ViT-B/16 vs
    # 97.5 at 256 (tools/bench_vit.py, BASELINE.md round 3); larger batches
    # only help if H2D latency dominates, and the pipeline already hides it
    # with the lag-2 in-flight window.
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--prec", default="fp32", choices=["fp32", "bf16"],
                    help="bf16 inference roughly doubles MXU throughput")
    ap.add_argument("--key", default="clip_vit_b32_feature")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel size: shard the ViT blocks "
                    "Megatron-style over a 'model' mesh axis (the remaining "
                    "devices form the data axis); for towers too large per "
                    "chip (ViT-L+) or small-batch latency")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel size: stage the ViT blocks "
                    "GPipe-style over a 'pipe' mesh axis (the remaining "
                    "devices form the data axis); point-to-point comms "
                    "only — for deep towers when all-reduce bandwidth is "
                    "the constraint")
    ap.add_argument("--microbatches", type=int, default=4,
                    help="GPipe microbatches per batch under --pp")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu); needed because "
                    "the axon TPU plugin ignores JAX_PLATFORMS")
    args = ap.parse_args()
    if args.tp > 1 and args.pp > 1:
        raise SystemExit("--tp and --pp are mutually exclusive")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from imp_tpu.models.clip import CLIP_CONFIGS, build_vision_tower

    model = build_vision_tower(args.model)
    size = CLIP_CONFIGS[args.model]["image_resolution"]
    if args.checkpoint:
        params = load_checkpoint_params(args.checkpoint, args.model)
    elif args.random_weights:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
        )
    else:
        raise SystemExit("Provide --checkpoint or --random-weights")

    cdtype = jnp.bfloat16 if args.prec == "bf16" else jnp.float32
    if args.prec == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )

    if args.tp > 1:
        if CLIP_CONFIGS[args.model]["vision_patch_size"] is None:
            raise SystemExit("--tp supports the ViT towers only")
        from imp_tpu.parallel.mesh import make_mesh
        from imp_tpu.parallel.tensor import (
            make_tp_encode, put_tp_params, split_vision_params_tp,
        )

        ndev = jax.device_count()
        if ndev % args.tp != 0:
            raise SystemExit(f"--tp {args.tp} does not divide {ndev} devices")
        dp = ndev // args.tp
        if args.batch_size % dp != 0:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by the "
                f"data-axis size {dp} (= devices/tp)"
            )
        mesh = make_mesh(("data", "model"), (dp, args.tp))
        tp_params = put_tp_params(
            split_vision_params_tp(params, args.tp), mesh
        )
        _tp_encode = make_tp_encode(
            model, mesh, pre=lambda x: device_normalize(x, cdtype)
        )

        def encode(p, x_u8):
            return _tp_encode(tp_params, x_u8).astype(jnp.float32)

        params = None  # weights live sharded in tp_params
        print(f"tensor parallel: mesh {mesh} (dp={dp}, tp={args.tp})")
    elif args.pp > 1:
        if CLIP_CONFIGS[args.model]["vision_patch_size"] is None:
            raise SystemExit("--pp supports the ViT towers only")
        from imp_tpu.parallel.mesh import make_mesh
        from imp_tpu.parallel.pipeline import (
            make_pp_encode, put_pp_params, split_vision_params_pp,
        )

        ndev = jax.device_count()
        if ndev % args.pp != 0:
            raise SystemExit(f"--pp {args.pp} does not divide {ndev} devices")
        dp = ndev // args.pp
        if args.batch_size % (dp * args.microbatches) != 0:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"data-axis size x microbatches = {dp * args.microbatches}"
            )
        mesh = make_mesh(("data", "pipe"), (dp, args.pp))
        pp_params = put_pp_params(
            split_vision_params_pp(params, args.pp), mesh
        )
        _pp_encode = make_pp_encode(
            model, mesh, args.microbatches,
            pre=lambda x: device_normalize(x, cdtype),
        )

        def encode(p, x_u8):
            return _pp_encode(pp_params, x_u8).astype(jnp.float32)

        params = None
        print(f"pipeline parallel: mesh {mesh} (dp={dp}, pp={args.pp}, "
              f"mb={args.microbatches})")
    else:

        @jax.jit
        def encode(p, x_u8):  # uint8 in, normalize on device
            return model.apply(p, device_normalize(x_u8, cdtype)).astype(
                jnp.float32
            )

    os.makedirs(args.dst, exist_ok=True)
    slides = sorted(
        d for d in os.listdir(args.src) if osp.isdir(osp.join(args.src, d))
    )
    bs = args.batch_size
    total_patches, t_start = 0, time.perf_counter()
    for slide in slides:
        out_path = osp.join(args.dst, slide + ".h5")
        if osp.exists(out_path):
            print(f"skip {slide} (exists)")
            continue
        sdir = osp.join(args.src, slide)
        patches = sorted(
            f for f in os.listdir(sdir) if f.lower().endswith(IMG_EXTS)
        )
        if not patches:
            continue

        # host decode thread keeps the accelerator fed
        q: "queue.Queue" = queue.Queue(maxsize=4)

        def producer():
            for s in range(0, len(patches), bs):
                chunk = patches[s : s + bs]
                arr = np.stack(
                    [
                        preprocess(osp.join(sdir, p), size, as_uint8=True)
                        for p in chunk
                    ]
                )
                if len(chunk) < bs:  # pad to the static batch
                    arr = np.pad(arr, ((0, bs - len(chunk)), (0, 0), (0, 0), (0, 0)))
                q.put((arr, len(chunk)))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # lag-2 readback: keep two batches in flight so the next host->device
        # upload and the current encode overlap instead of serializing on
        # each np.asarray readback
        feats, inflight = [], []
        while True:
            item = q.get()
            if item is None:
                break
            arr, n = item
            inflight.append((encode(params, jnp.asarray(arr)), n))
            if len(inflight) > 2:
                out, k = inflight.pop(0)
                feats.append(np.asarray(out[:k]))
        for out, k in inflight:
            feats.append(np.asarray(out[:k]))
        t.join()
        feats = np.concatenate(feats, axis=0)
        import h5py

        # write to a temp file renamed into place so an interrupted
        # extraction never leaves a partial .h5 that a resume would skip
        with h5py.File(out_path + ".tmp", "w") as f:
            f.create_dataset(args.key, data=feats)
        os.replace(out_path + ".tmp", out_path)
        total_patches += len(patches)
        rate = total_patches / (time.perf_counter() - t_start)
        print(f"{slide}: {len(patches)} patches -> {out_path}  ({rate:.1f} patches/s)")


if __name__ == "__main__":
    main()
