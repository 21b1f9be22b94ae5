"""Device-parallel WSI patch -> CLIP feature extraction.

TPU-native replacement for reference ``tools/clip_feature_dp.py:28-117``
(one patch per forward on one GPU): global patch batches are sharded
across **all local devices** over a 1-axis ``jax.sharding.Mesh`` — XLA
splits the batch, each chip encodes its shard, results gather on host.
Keeps the reference's CLI contract: short model flags (``clip_vit_b32``,
``clip_r50``, ...), tree layout ``{output_dir}/{model}/{dataset}``, per-slide
``.h5`` files under the ``clip_feature`` key, and skip-if-exists resume.

Usage:
    python tools/clip_feature_dp.py --root DATA_ROOT --dataset tcga_glioma \
        --output-dir FEATURES --model clip_vit_b32 \
        (--checkpoint ViT-B-32.pt | --random-weights) [--batch-size 512]
"""

import argparse
import os
import os.path as osp
import queue
import sys
import threading
import time

_HERE = osp.dirname(osp.abspath(__file__))
sys.path.insert(0, osp.join(_HERE, ".."))
sys.path.insert(0, _HERE)

import numpy as np

from clip_feature import (
    IMG_EXTS,
    device_normalize,
    load_checkpoint_params,
    preprocess,
)

# short flag -> canonical CLIP name (reference clip_feature_dp.py:31-49)
MODEL_FLAGS = {
    "clip_vit_b32": "ViT-B/32",
    "clip_vit_b16": "ViT-B/16",
    "clip_vit_l14": "ViT-L/14",
    "clip_vit_l14@336px": "ViT-L/14@336px",
    "clip_r50": "RN50",
    "clip_r101": "RN101",
    "clip_r50x4": "RN50x4",
    "clip_r50x16": "RN50x16",
    "clip_r50x64": "RN50x64",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--model", default="clip_vit_b32", choices=sorted(MODEL_FLAGS))
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--batch-size", type=int, default=512,
                    help="GLOBAL batch (split across devices; rounded up to"
                         " a multiple of the device count)")
    ap.add_argument("--prec", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--key", default="clip_feature")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from imp_tpu.models.clip import CLIP_CONFIGS, build_vision_tower

    name = MODEL_FLAGS[args.model]
    model = build_vision_tower(name)
    size = CLIP_CONFIGS[name]["image_resolution"]
    if args.checkpoint:
        params = load_checkpoint_params(args.checkpoint, name)
    elif args.random_weights:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
        )
    else:
        raise SystemExit("Provide --checkpoint or --random-weights")

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    bs = -(-args.batch_size // len(devices)) * len(devices)
    params = jax.device_put(params, NamedSharding(mesh, P()))  # replicate

    cdtype = jnp.bfloat16 if args.prec == "bf16" else jnp.float32
    if args.prec == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )

    encode = jax.jit(
        # uint8 batches in, normalization fused on device (clip_feature.py)
        lambda p, x: model.apply(
            p, device_normalize(x, cdtype)
        ).astype(jnp.float32),
        out_shardings=NamedSharding(mesh, P("data")),
    )

    output_dir = osp.join(args.output_dir, args.model, args.dataset)
    os.makedirs(output_dir, exist_ok=True)
    root = osp.join(args.root, args.dataset, "images", "train")
    # splitext (not split('.')) so slide IDs containing dots resume
    # correctly; .h5 only, so the in-progress .h5.tmp of a crashed run
    # does not mark a slide done
    done = {
        osp.splitext(f)[0]
        for f in os.listdir(output_dir)
        if f.endswith(".h5")
    }
    slides = sorted(
        d
        for d in os.listdir(root)
        if osp.isdir(osp.join(root, d)) and d not in done
    )
    print(
        f"{name} on {len(devices)} device(s), global batch {bs}, "
        f"{len(slides)} slides to encode"
    )

    total_patches, t_start = 0, time.perf_counter()
    for slide in slides:
        sdir = osp.join(root, slide)
        patches = sorted(
            f for f in os.listdir(sdir) if f.lower().endswith(IMG_EXTS)
        )
        if len(patches) <= 1:  # reference skips single-patch slides
            continue

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
                if len(chunk) < bs:  # pad to the static sharded batch
                    arr = np.pad(
                        arr, ((0, bs - len(chunk)), (0, 0), (0, 0), (0, 0))
                    )
                q.put((arr, len(chunk)))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        # lag-2 readback keeps two sharded batches in flight (upload and
        # encode overlap instead of serializing on every readback)
        feats, inflight = [], []
        while True:
            item = q.get()
            if item is None:
                break
            arr, n = item
            x = jax.device_put(jnp.asarray(arr), batch_sharding)
            inflight.append((encode(params, x), n))
            if len(inflight) > 2:
                out, k = inflight.pop(0)
                feats.append(np.asarray(out)[:k])
        for out, k in inflight:
            feats.append(np.asarray(out)[:k])
        t.join()
        import h5py

        # write to a temp file renamed into place so an interrupted
        # extraction is retried on resume instead of read as complete
        final = osp.join(output_dir, f"{slide}.h5")
        with h5py.File(final + ".tmp", "w") as f:
            f.create_dataset(args.key, data=np.concatenate(feats, axis=0))
        os.replace(final + ".tmp", final)
        total_patches += len(patches)
        rate = total_patches / (time.perf_counter() - t_start)
        print(f"{slide}: {len(patches)} patches  ({rate:.1f} patches/s)")


if __name__ == "__main__":
    main()
