"""Synthetic on-disk mini-TCGA tree for tests and benchmarks.

Materializes exactly the file layout the real readers expect
(5-fold label CSVs for all four tasks, per-slide .h5 feature bags with the
reference's h5 key, per-slide molecular CSVs with gene_name +
fpkm_uq_unstranded columns, and a signatures.csv with the six gene groups),
so the *production* reader/manager code paths are exercised end-to-end
without TCGA data (SURVEY.md §4 test strategy item (c)).

The synthetic labels are made *learnable*: each class shifts the bag
features and the survival bin correlates with survival months, so a
training run must improve its metrics above chance.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import h5py
import numpy as np
import pandas as pd

GENE_GROUP_NAMES = [
    "Tumor Suppressor Genes",
    "Oncogenes",
    "Protein Kinases",
    "Cell Differentiation Markers",
    "Transcription Factors",
    "Cytokines and Growth Factors",
]


def materialize(
    root: str,
    num_slides: int = 24,
    bag_min: int = 64,
    bag_max: int = 256,
    feat_dim: int = 512,
    num_genes: int = 240,
    group_size: int = 30,
    feature_name: str = "features_clip_vit_b16",
    h5_key: str = "clip_vit_b32_feature",
    num_folds: int = 5,
    seed: int = 0,
) -> str:
    """Create the tree under ``root`` and return the dataset root."""
    rng = np.random.default_rng(seed)
    ds = osp.join(root, "tcga_glioma")
    bag_dir = osp.join(ds, feature_name)
    mol_dir = osp.join(ds, "molecular")
    os.makedirs(bag_dir, exist_ok=True)
    os.makedirs(mol_dir, exist_ok=True)
    for sub in ("survival", "classification", "grading", "subtyping"):
        os.makedirs(osp.join(ds, "labels", sub), exist_ok=True)

    gene_names = [f"GENE{g}" for g in range(num_genes)]
    # signatures: six disjoint groups of ``group_size`` genes
    sig = {}
    for gi, gname in enumerate(GENE_GROUP_NAMES):
        sig[gname] = gene_names[gi * group_size : (gi + 1) * group_size]
    max_len = max(len(v) for v in sig.values())
    sig_padded = {
        k: v + [np.nan] * (max_len - len(v)) for k, v in sig.items()
    }
    pd.DataFrame(sig_padded).to_csv(osp.join(ds, "labels", "signatures.csv"), index=False)

    records = []
    n_surv_bins, n_cls, n_grade, n_sub = 4, 6, 3, 3
    class_dirs = rng.normal(size=(n_cls, feat_dim)).astype(np.float32)
    for i in range(num_slides):
        sid = f"SYN-{i:04d}-01A"
        cls_label = int(i % n_cls)
        grade = cls_label % n_grade
        subtype = cls_label % n_sub
        surv_bin = cls_label % n_surv_bins
        n_patches = int(rng.integers(bag_min, bag_max + 1))
        bag = rng.normal(size=(n_patches, feat_dim)).astype(np.float32)
        bag += 0.75 * class_dirs[cls_label]
        with h5py.File(osp.join(bag_dir, sid + ".h5"), "w") as f:
            f.create_dataset(h5_key, data=bag)
        expr = rng.lognormal(mean=1.0, sigma=1.0, size=num_genes).astype(np.float32)
        expr[:group_size] += 3.0 * surv_bin  # informative genes
        pd.DataFrame({"gene_name": gene_names, "fpkm_uq_unstranded": expr}).to_csv(
            osp.join(mol_dir, sid + ".csv"), index=False
        )
        surv_months = float(10.0 + 25.0 * surv_bin + rng.normal(0, 2.0))
        censorship = int(rng.random() < 0.3)
        records.append(
            dict(
                features=sid + ".h5",
                cls_label=cls_label,
                grade=grade,
                subtype=subtype,
                surv_bin=surv_bin,
                survival_months=max(surv_months, 1.0),
                censorship=censorship,
            )
        )

    df = pd.DataFrame(records)
    idx = np.arange(num_slides)
    for fold in range(1, num_folds + 1):
        rs = np.random.default_rng(fold)
        perm = rs.permutation(idx)
        n_test = max(2, num_slides // 5)
        test_idx, train_idx = perm[:n_test], perm[n_test:]

        def _write(task, label_col, extra=()):
            sub = {"survival": "survival", "classification": "classification",
                   "grading": "grading", "subtyping": "subtyping"}[task]
            for split, rows in (("train", train_idx), ("test", test_idx)):
                out = pd.DataFrame(
                    {
                        "features": df.loc[rows, "features"].values,
                        "labels": df.loc[rows, label_col].values,
                        **{e: df.loc[rows, e].values for e in extra},
                    }
                )
                out.to_csv(
                    osp.join(ds, "labels", sub, f"{task}_{split}_{fold}.csv"),
                    index=False,
                )

        _write("survival", "surv_bin", extra=("survival_months", "censorship"))
        _write("classification", "cls_label")
        _write("grading", "grade")
        _write("subtyping", "subtype")

    with open(osp.join(ds, "synthetic_meta.json"), "w") as f:
        json.dump(
            dict(num_slides=num_slides, feat_dim=feat_dim, num_genes=num_genes,
                 group_size=group_size, seed=seed),
            f,
        )
    return root
