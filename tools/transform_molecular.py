"""GDC RNA-seq TSVs -> per-WSI molecular CSVs
(reference ``tools/transform_molecular.py:12-101``): selects the
top-variance genes plus the six signature-category genes and writes one
``gene_name,fpkm_uq_unstranded`` CSV per WSI feature file.

Usage:
    python tools/transform_molecular.py --gdc-meta metadata.cart.json \
        --gene-variance TCGA_GBM_gene_sorted.csv --origin-dir origin_molecular \
        --feature-dir features_clip_vit_b16 --out-dir molecular --top-k 1039
"""

import argparse
import json
import os
import os.path as osp

import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gdc-meta", required=True, help="GDC metadata.cart JSON")
    ap.add_argument("--gene-variance", required=True,
                    help="CSV with gene_name + variance columns")
    ap.add_argument("--origin-dir", required=True, help="raw GDC TSV root")
    ap.add_argument("--feature-dir", required=True, help="per-WSI .h5 dir")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--top-k", type=int, default=1039)
    args = ap.parse_args()

    gene_df = pd.read_csv(args.gene_variance)
    gene_df = gene_df.sort_values(by="variance", ascending=False).head(args.top_k)
    c_gene_list = gene_df["gene_name"].dropna().tolist()

    with open(args.gdc_meta) as f:
        meta = json.load(f)

    os.makedirs(args.out_dir, exist_ok=True)
    wsi_ids = os.listdir(args.feature_dir)
    count = 0
    for entry in meta:
        file_path = osp.join(args.origin_dir, entry["file_id"], entry["file_name"])
        if not osp.isfile(file_path):
            continue
        subparts = entry["associated_entities"][0]["entity_submitter_id"].split("-")[:3]
        entity_id = "-".join(subparts)
        df = pd.read_csv(file_path, sep="\t", skiprows=1)
        context = df[df["gene_name"].isin(c_gene_list)][
            ["gene_name", "fpkm_uq_unstranded"]
        ]
        for wsi in wsi_ids:
            if entity_id in wsi and wsi.endswith(".h5"):
                out = osp.join(args.out_dir, wsi.replace(".h5", ".csv"))
                context.to_csv(out, index=False)
                count += 1
                print(f"wrote {out}")
    print(f"total files: {count}")


if __name__ == "__main__":
    main()
