"""Standalone 5-fold split writer (reference ``tools/kfold.py:13-27``).

Usage:
    python tools/kfold.py --labels all_labels.csv --out labels/survival \
        --task survival [--extra-cols survival_months censorship]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import pandas as pd

from imp_tpu.data.labeling import write_kfold_splits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", required=True, help="CSV with features+labels cols")
    ap.add_argument("--out", required=True)
    ap.add_argument("--task", required=True)
    ap.add_argument("--extra-cols", nargs="*", default=[])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    df = pd.read_csv(args.labels)
    write_kfold_splits(
        df, args.out, args.task, seed=args.seed, extra_cols=tuple(args.extra_cols)
    )
    print(f"Wrote 5-fold splits for {len(df)} samples under {args.out}")


if __name__ == "__main__":
    main()
