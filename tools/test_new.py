"""External-cohort (CPTAC) evaluation entry point
(reference ``tools/test_new.py``): loads a trained model and runs
``trainer.test_new`` against ``<DATASET.ROOT>/test/``.

Usage:
    python tools/test_new.py --root DATA --seed 1 --trainer MBTRAIN \
        --config-file configs/Survival/UMEML_GAN.yaml \
        --model-dir output/umeml_gan_s1 --eval-only
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from train import reset_cfg, setup_cfg  # same CLI surface as tools/train.py

from imp_tpu.utils import collect_env_info, set_random_seed, setup_logger


def main(args):
    cfg = setup_cfg(args)
    if cfg.SEED >= 0:
        set_random_seed(cfg.SEED)
    setup_logger(cfg.OUTPUT_DIR)
    if cfg.VERBOSE:
        print("*** Config ***")
        print(cfg)
        print(collect_env_info())

    from imp_tpu.engine import build_trainer

    trainer = build_trainer(cfg)
    trainer.load_model(args.model_dir or cfg.OUTPUT_DIR, epoch=args.load_epoch)
    trainer.test_new(
        cfg,
        umeml_gan_test_without_omic_ratio=max(
            args.umeml_gan_test_without_omic_ratio, 0
        ),
        umeml_gan_test_insample_without_omic_ratio=args.umeml_gan_test_insample_without_omic_ratio,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="")
    parser.add_argument("--output-dir", type=str, default="")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--seed", type=int, default=-1)
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--trainer", type=str, default="")
    parser.add_argument("--backbone", type=str, default="")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--model-dir", type=str, default="")
    parser.add_argument("--load-epoch", type=int, default=None)
    parser.add_argument("--no-train", action="store_true")
    parser.add_argument("--umeml_gan_test_without_omic_ratio", type=float, default=-1)
    parser.add_argument(
        "--umeml_gan_test_insample_without_omic_ratio", type=float, default=0
    )
    parser.add_argument(
        "--platform", type=str, default="",
        help="force a jax platform (e.g. 'cpu'); JAX_PLATFORMS alone is "
             "ignored by this environment's TPU plugin",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    _args = parser.parse_args()
    if _args.platform:
        import jax

        jax.config.update("jax_platforms", _args.platform)
    main(_args)
