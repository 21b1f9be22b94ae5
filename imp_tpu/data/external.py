"""External-cohort (CPTAC) test set — the out-of-distribution robustness
evaluation (reference ``dataset_new.py:192-389`` + ``tools/test_new.py``).

Config-driven paths replace the reference's hardcoded ``DATASET/test/...``:
the set lives under ``<DATASET.ROOT>/test/`` with

    labels/{survival,grading}/{survival,grading}_test.csv
        (columns: patients, labels[, survival_months, censorship])
    features_clip_vit_b16/<patient>.h5
    molecular/<patient>.csv        (optional — missing => GAN imputation)

Samples with no molecular CSV get a zero omics vector and
``without_omic = 1`` so UMEML_GAN generates their omics embedding
(the reference's custom_collate keeps None omics and flips the flag,
``dataset_new.py:381-389``, ``mbtrain.py:438-439``).
"""

from __future__ import annotations

import os.path as osp
from typing import List, Tuple

import numpy as np
import pandas as pd

from .datum import Datum
from .manager import SlideDataset, EpochLoader

TASK_SUBDIR = {"survival": "survival", "grading": "grading"}
CLASSNAMES = {
    "survival": {0: "SGrade I", 1: "SGrade II", 2: "SGrade III", 3: "SGrade IIII"},
    "grading": {0: "Grade 4", 1: "Grade 3", 2: "Grade 2"},
}


class ExternalSlideDataset(SlideDataset):
    """SlideDataset that tolerates missing molecular CSVs."""

    def __init__(self, cfg, data_source, omic_dim: int, cache: bool = True):
        super().__init__(cfg, data_source, cache=cache)
        self.omic_dim = omic_dim

    def _load_raw(self, idx: int):
        import h5py

        item = self.data_source[idx]
        with h5py.File(item.impath, "r") as f:
            bag = np.asarray(f[self.h5_key][:], dtype=np.float32)
        if item.molpath and osp.isfile(item.molpath):
            mol = pd.read_csv(item.molpath)["fpkm_uq_unstranded"].to_numpy(np.float32)
        else:
            mol = None
        return bag, mol

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        item = self.data_source[idx]
        bag, mol = self._load_raw(idx)
        n = min(bag.shape[0], self.bag_pad)
        img = np.zeros((self.bag_pad, bag.shape[1]), dtype=np.float32)
        img[:n] = bag[:n]
        mask = np.zeros((self.bag_pad,), dtype=bool)
        mask[:n] = True
        missing = mol is None
        if missing:
            mol = np.zeros((self.omic_dim,), np.float32)
        out = {
            "img": img,
            "img_mask": mask,
            "mol": mol[: self.omic_dim]
            if len(mol) >= self.omic_dim
            else np.pad(mol, (0, self.omic_dim - len(mol))),
            "label": np.int32(item.label),
            "without_omic": np.float32(1.0 if missing else 0.0),
            "patient_id": item.patientid,
            "index": np.int32(idx),
        }
        if self.is_survival:
            out["survival_month"] = np.float32(item.survival["survival_months"])
            out["censorship"] = np.float32(item.survival["censorship"])
        if self._cache is not None:
            self._cache[idx] = out
        return out


def read_external_items(cfg) -> List[Datum]:
    task = cfg.TASK.NAME.lower()
    sub = TASK_SUBDIR[task]
    root = osp.abspath(osp.expanduser(cfg.DATASET.ROOT))
    base = osp.join(root, "test")
    label_path = osp.join(base, "labels", sub, f"{sub}_test.csv")
    bag_dir = osp.join(base, cfg.DATASET.FEATURE_NAME)
    mol_dir = osp.join(base, "molecular")
    names = CLASSNAMES[task]

    label_df = pd.read_csv(label_path)
    label_df["patients"] = label_df["patients"].astype(str).str.strip()
    items = []
    for _, row in label_df.iterrows():
        pid = row["patients"]
        impath = osp.join(bag_dir, pid + ".h5")
        if not osp.isfile(impath):
            continue
        molpath = osp.join(mol_dir, pid + ".csv")
        survival = None
        if task == "survival":
            survival = {
                "labels": row["labels"],
                "survival_months": row["survival_months"],
                "censorship": row["censorship"],
            }
        items.append(
            Datum(
                patientid=pid,
                impath=impath,
                molpath=molpath if osp.isfile(molpath) else "",
                label=int(row["labels"]),
                classname=names[int(row["labels"])],
                survival=survival,
            )
        )
    return items


def build_test_new(cfg, omic_dim: int) -> Tuple[ExternalSlideDataset, EpochLoader]:
    items = read_external_items(cfg)
    ds = ExternalSlideDataset(cfg, items, omic_dim=omic_dim)
    loader = EpochLoader(
        ds, cfg.DATALOADER.TEST.BATCH_SIZE, shuffle=False, prefetch=cfg.TPU.PREFETCH
    )
    return ds, loader
