"""Generate external-cohort (CPTAC) test labels
(reference ``tools/generate_test_labels.py:4-52``): OS days -> months, event
flip to censorship, WHO-2021 labelers for grading.

Usage:
    python tools/generate_test_labels.py --meta CPTAC.xlsx --task survival \
        --out DATASET/test/labels
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import pandas as pd

from imp_tpu.data.labeling import DAYS_IN_MONTH, diag_grading


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", required=True)
    ap.add_argument("--task", choices=["survival", "grading"], required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="case_id")
    ap.add_argument("--os-days-col", default="OS_days")
    ap.add_argument("--os-event-col", default="OS_event")
    args = ap.parse_args()

    reader = pd.read_excel if args.meta.endswith((".xlsx", ".xls")) else pd.read_csv
    meta = reader(args.meta)
    out_dir = osp.join(args.out, args.task)
    os.makedirs(out_dir, exist_ok=True)

    if args.task == "survival":
        df = pd.DataFrame()
        df["patients"] = meta[args.id_col].astype(str).str.strip()
        df["survival_months"] = meta[args.os_days_col].apply(
            lambda d: round(float(d) / DAYS_IN_MONTH, 2)
        )
        # event=1 in CPTAC means death -> censorship = 1 - event
        df["censorship"] = 1 - meta[args.os_event_col].astype(int)
        # bin edges must come from the TCGA training quantiles; labels here
        # are only used for bookkeeping (C-index needs time+censorship)
        df["labels"] = 0
        df.to_csv(osp.join(out_dir, "survival_test.csv"), index=False)
    else:
        df = pd.DataFrame()
        df["patients"] = meta[args.id_col].astype(str).str.strip()
        df["labels"] = meta.apply(
            lambda r: diag_grading(
                r.get("IDH status"), r.get("1p/19q codeletion"),
                r.get("histological_type"), r.get("CDKN2AB"),
                r.get("neoplasm_histologic_grade"),
            ),
            axis=1,
        )
        df = df.dropna(subset=["labels"])
        df["labels"] = df["labels"].astype(int)
        df.to_csv(osp.join(out_dir, "grading_test.csv"), index=False)
    print(f"Wrote {out_dir}")


if __name__ == "__main__":
    main()
