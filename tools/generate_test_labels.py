"""Generate external-cohort (CPTAC) test labels
(reference ``tools/generate_test_labels.py:4-167``): OS days -> months,
event flip to censorship, quantile survival binning over the uncensored
patients, and the WHO-2021 labelers for grading (3-level) and
classification (6-class integrated diagnosis).

Column defaults match the reference's CPTAC workbook
(``DATASET/test/labels/survival/CPTAC.xlsx``: WSI_ID / OS / event /
IDH status / 1p/19q codeletion / Histology / CDKN2A / 2016-Grade).

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

from imp_tpu.data.labeling import diag_grading, diag_grading6, survival_bins


def read_meta(path: str) -> pd.DataFrame:
    if not path.endswith((".xlsx", ".xls")):
        return pd.read_csv(path)
    try:
        return pd.read_excel(path)
    except ImportError:
        if not path.endswith(".xlsx"):
            # legacy binary .xls is not a zip — the stdlib fallback cannot
            # parse it; surface the missing-engine error instead
            raise
        # no openpyxl engine in this environment: stdlib OOXML fallback
        from imp_tpu.data.xlsx import read_xlsx

        return read_xlsx(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", required=True)
    ap.add_argument(
        "--task", choices=["survival", "grading", "classification"],
        required=True,
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="WSI_ID")
    ap.add_argument("--os-days-col", default="OS")
    ap.add_argument("--os-event-col", default="event")
    ap.add_argument("--idh-col", default="IDH status")
    ap.add_argument("--codel-col", default="1p/19q codeletion")
    ap.add_argument("--his-col", default="Histology")
    ap.add_argument("--cdkn-col", default="CDKN2A")
    ap.add_argument("--grade-col", default="2016-Grade")
    args = ap.parse_args()

    meta = read_meta(args.meta)
    out_dir = osp.join(args.out, args.task)
    os.makedirs(out_dir, exist_ok=True)

    if args.task == "survival":
        # the exact reference Survival_T math (ref :4-52): months = OS days
        # / 30.44 rounded to 2, event flipped to censorship, 4 quantile
        # bins over the UNCENSORED patients clipped to the global range
        df = survival_bins(
            meta, time_col=args.os_days_col, event_col=args.os_event_col,
            id_col=args.id_col,
        )
        df["patients"] = df["patients"].astype(str).str.strip()
        df.to_csv(osp.join(out_dir, "survival_test.csv"), index=False)
    else:
        labeler = diag_grading if args.task == "grading" else diag_grading6
        df = pd.DataFrame()
        df["patients"] = meta[args.id_col].astype(str).str.strip()
        df["labels"] = meta.apply(
            lambda r: labeler(
                r.get(args.idh_col), r.get(args.codel_col),
                r.get(args.his_col), r.get(args.cdkn_col),
                r.get(args.grade_col),
            ),
            axis=1,
        )
        df = df.dropna(subset=["labels"])
        df["labels"] = df["labels"].astype(int)
        df.to_csv(osp.join(out_dir, f"{args.task}_test.csv"), index=False)
    print(f"Wrote {out_dir}")


if __name__ == "__main__":
    main()
