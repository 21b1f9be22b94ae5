"""AOT-export a trained model's eval forward for serving.

The reference has no deployment path (inference lives inside the training
harness, ``/root/reference/medmm/engine/trainer.py:550-581``); this tool
writes a self-contained serving artifact (StableHLO program + params +
manifest — see ``imp_tpu/serving.py``) from a training output directory.

Usage:
    python tools/export_model.py --root DATA --seed 1 --trainer MBTRAIN \
        --config-file configs/Survival/UMEML_GAN.yaml \
        --model-dir output/umeml_gan_s1 --export-dir exported/umeml_gan_s1 \
        [--load-epoch N] [--platforms tpu,cpu] [--check] [KEY VALUE ...]

``--check`` reloads the artifact and asserts its logits match the live
trainer's eval step on one validation batch.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

from imp_tpu.config import clean_cfg, get_cfg_default
from imp_tpu.utils import set_random_seed


def setup_cfg(args):
    cfg = get_cfg_default()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.seed:
        cfg.SEED = args.seed
        cfg.DATASET.FOLD = args.seed
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.model_dir:
        cfg.OUTPUT_DIR = args.model_dir
    # export needs the single-logical-device eval program
    cfg.TPU.MESH_SHAPE = (1,)
    if args.opts:
        cfg.merge_from_list(args.opts)
    clean_cfg(cfg, args.trainer)
    cfg.freeze()
    return cfg


def main(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    cfg = setup_cfg(args)
    if cfg.SEED >= 0:
        set_random_seed(cfg.SEED)

    from imp_tpu.engine import build_trainer
    from imp_tpu.serving import export_trainer, load_model

    trainer = build_trainer(cfg)
    if args.model_dir:
        trainer.load_model(args.model_dir, epoch=args.load_epoch)
    platforms = (
        [p.strip() for p in args.platforms.split(",") if p.strip()]
        if args.platforms
        else None
    )
    manifest = export_trainer(trainer, args.export_dir, platforms=platforms)
    print(
        f"exported {manifest['model']} ({manifest['task']}, batch "
        f"{manifest['batch_size']}, platforms {manifest['platforms']}) "
        f"-> {args.export_dir}"
    )

    if args.check:
        served = load_model(args.export_dir)
        raw = next(iter(trainer.test_loader or trainer.val_loader))
        if hasattr(trainer, "_host_batch"):
            hb = trainer._host_batch(raw, train=False)
            want = trainer._eval_step(trainer.state["params"], hb)[0]
        else:
            from imp_tpu.engine.trainer import ARRAY_KEYS

            hb = {k: np.asarray(v) for k, v in raw.items() if k in ARRAY_KEYS}
            want = trainer._eval_step(trainer.params, trainer.model_state, hb)
        got = served.predict(hb)["logits"]
        err = float(np.max(np.abs(got - np.asarray(want))))
        assert err < 1e-5, f"serving mismatch vs live eval step: {err}"
        print(f"check OK: serving logits match the live eval step ({err:.2e})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="", help="path to dataset")
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--trainer", type=str, default="")
    parser.add_argument("--seed", type=int, default=-1, help="seed (= fold id)")
    parser.add_argument(
        "--model-dir", type=str, default="",
        help="training OUTPUT_DIR holding the checkpoint to export",
    )
    parser.add_argument("--load-epoch", type=int, default=None)
    parser.add_argument(
        "--export-dir", type=str, required=True, help="artifact output directory"
    )
    parser.add_argument(
        "--platforms", type=str, default="",
        help="comma-separated lowering targets, e.g. 'tpu,cpu' "
             "(default: current backend)",
    )
    parser.add_argument(
        "--check", action="store_true",
        help="reload the artifact and compare against the live eval step",
    )
    parser.add_argument("--platform", type=str, default="", help="force jax platform")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    main(parser.parse_args())
