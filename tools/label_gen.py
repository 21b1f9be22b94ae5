"""Generate task labels + 5-fold splits from a clinical/molecular metadata
table (reference ``tools/label_gen.py`` + ``tools/kfold.py``).

Input: a CSV/XLSX with columns for patient barcode, IDH status, 1p/19q
codeletion, histology, CDKN2A/B status, grade, OS, OS.time, and the
feature-file mapping.  Output: ``labels/{task}/{task}_{train,test}_{fold}.csv``.

Usage:
    python tools/label_gen.py --meta clinical.csv --wsi-dir features_dir \
        --out DATASET/tcga_glioma/labels --task survival
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import pandas as pd

from imp_tpu.data.labeling import (
    diag_grading,
    diag_grading4,
    diag_grading6,
    diag_subtyping,
    survival_bins,
    write_kfold_splits,
)

LABELERS = {
    "grading": diag_grading,
    "subtyping": diag_subtyping,
    "classification": diag_grading6,
    "classification4": diag_grading4,
}


def map_wsi_files(df, wsi_dir, id_col):
    """Attach every .h5 whose name starts with the patient barcode."""
    files = sorted(f for f in os.listdir(wsi_dir) if f.endswith(".h5"))
    rows = []
    for _, row in df.iterrows():
        pid = str(row[id_col])
        for f in files:
            if f.startswith(pid):
                r = row.to_dict()
                r["features"] = f
                rows.append(r)
    return pd.DataFrame(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", required=True, help="clinical metadata CSV/XLSX")
    ap.add_argument("--wsi-dir", required=True, help="feature .h5 dir")
    ap.add_argument("--out", required=True, help="labels output root")
    ap.add_argument("--task", required=True,
                    choices=["survival", "grading", "subtyping", "classification"])
    ap.add_argument("--id-col", default="bcr_patient_barcode")
    ap.add_argument("--idh-col", default="IDH status")
    ap.add_argument("--p19q-col", default="1p/19q codeletion")
    ap.add_argument("--his-col", default="histological_type")
    ap.add_argument("--cdkn-col", default="CDKN2AB")
    ap.add_argument("--grade-col", default="neoplasm_histologic_grade")
    ap.add_argument("--n-bins", type=int, default=4)
    args = ap.parse_args()

    reader = pd.read_excel if args.meta.endswith((".xlsx", ".xls")) else pd.read_csv
    meta = reader(args.meta)

    if args.task == "survival":
        surv = survival_bins(meta, n_bins=args.n_bins, id_col=args.id_col)
        df = map_wsi_files(surv, args.wsi_dir, "patients")
        out_dir = osp.join(args.out, "survival")
        write_kfold_splits(
            df, out_dir, "survival", extra_cols=("survival_months", "censorship")
        )
    else:
        labeler = LABELERS[args.task]
        meta = meta.copy()
        meta["labels"] = meta.apply(
            lambda r: labeler(
                r[args.idh_col], r[args.p19q_col], r[args.his_col],
                r[args.cdkn_col], r[args.grade_col],
            ),
            axis=1,
        )
        meta = meta.dropna(subset=["labels"])
        meta["labels"] = meta["labels"].astype(int)
        df = map_wsi_files(meta, args.wsi_dir, args.id_col)
        out_dir = osp.join(args.out, args.task)
        write_kfold_splits(df, out_dir, args.task)
    print(f"Wrote 5-fold splits under {out_dir}")


if __name__ == "__main__":
    main()
