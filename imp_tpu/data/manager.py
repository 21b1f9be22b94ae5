"""DataManager: host-side input pipeline.

Replaces the reference's torch DataLoader + DatasetWrapper_UMEML
(``medmm/data/data_manager.py``) with a numpy pipeline producing
**fixed-shape, boolean-masked** batches ready for the jitted TPU step:

* bags are padded (or truncated) to the static ``DATASET.BAG_PAD`` length
  with an explicit ``img_mask`` — no -10000 sentinel
  (ref ``data_manager.py:356-367``);
* gene-group indexes are computed **here** from signatures.csv + one
  molecular CSV, instead of inside the model
  (ref ``umeml_gan.py:347-369`` hardcodes dataset paths in the model);
* an in-memory bag cache plus a background prefetch thread overlap h5 IO
  with TPU compute;
* per-epoch shuffling is seeded (seed + epoch) for reproducibility.
"""

from __future__ import annotations

import os.path as osp
import queue
import threading
from collections import OrderedDict
from typing import Dict, List, Optional

import h5py
import numpy as np
import pandas as pd

from .datasets import build_dataset
from .datum import Datum, get_event_and_censorship

GENE_GROUP_COLUMNS = [
    "Tumor Suppressor Genes",
    "Oncogenes",
    "Protein Kinases",
    "Cell Differentiation Markers",
    "Transcription Factors",
    "Cytokines and Growth Factors",
]


def load_gene_group_indexes(
    signatures_path: str, molecular_csv_path: str
) -> List[List[int]]:
    """Row indexes of each gene group inside the per-slide molecular CSV
    (reference ``umeml_gan.py:347-369``)."""
    signature_df = pd.read_csv(signatures_path)
    omic_df = pd.read_csv(molecular_csv_path)
    groups = []
    for col in GENE_GROUP_COLUMNS:
        gene_list = signature_df[col].dropna().tolist()
        matched = omic_df.index[omic_df["gene_name"].isin(gene_list)]
        groups.append(matched.tolist())
    return groups


class SlideDataset:
    """Item reader: h5 bag + molecular CSV -> numpy sample dict."""

    def __init__(self, cfg, data_source: List[Datum], cache: bool = True):
        self.cfg = cfg
        self.data_source = data_source
        self.h5_key = cfg.DATASET.H5_KEY
        self.bag_pad = int(cfg.DATASET.BAG_PAD)
        self.is_survival = cfg.TASK.NAME == "Survival"
        # LRU host cache with a byte budget: at the reference envelope
        # (10k x 512 fp32 bags ~ 20 MB/slide) an unbounded cache OOMs a
        # real run, so evict least-recently-used slides past CACHE_GB.
        self._cache: Optional[OrderedDict] = OrderedDict() if cache else None
        self._cache_budget = int(
            float(getattr(cfg.DATALOADER, "CACHE_GB", 8.0)) * (1 << 30)
        )
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()

    def __len__(self):
        return len(self.data_source)

    def _load_raw(self, idx: int):
        item = self.data_source[idx]
        with h5py.File(item.impath, "r") as f:
            bag = np.asarray(f[self.h5_key][:], dtype=np.float32)
        mol = pd.read_csv(item.molpath)["fpkm_uq_unstranded"].to_numpy(np.float32)
        return bag, mol

    @staticmethod
    def _nbytes(sample: Dict) -> int:
        return sum(
            v.nbytes for v in sample.values() if isinstance(v, np.ndarray)
        )

    def __getitem__(self, idx: int) -> Dict:
        if self._cache is not None:
            with self._cache_lock:
                if idx in self._cache:
                    self._cache.move_to_end(idx)
                    return self._cache[idx]
        item = self.data_source[idx]
        bag, mol = self._load_raw(idx)
        if bag.shape[0] > self.bag_pad:
            if not getattr(self, "_overflow_warned", False):
                self._overflow_warned = True
                mode = getattr(self.cfg.DATALOADER, "BAG_OVERFLOW", "truncate")
                print(
                    f"WARNING: slide bags exceed DATASET.BAG_PAD="
                    f"{self.bag_pad} (first: {bag.shape[0]} patches); "
                    f"overflow mode: {mode}"
                )
            if getattr(self.cfg.DATALOADER, "BAG_OVERFLOW", "truncate") == "sample":
                # seeded uniform subset, original order — every region of
                # the slide can contribute, unlike prefix truncation
                sel = np.random.default_rng(idx).choice(
                    bag.shape[0], self.bag_pad, replace=False
                )
                bag = bag[np.sort(sel)]
        n = min(bag.shape[0], self.bag_pad)
        img = np.zeros((self.bag_pad, bag.shape[1]), dtype=np.float32)
        img[:n] = bag[:n]
        mask = np.zeros((self.bag_pad,), dtype=bool)
        mask[:n] = True
        out = {
            "img": img,
            "img_mask": mask,
            "mol": mol,
            "label": np.int32(item.label),
            "patient_id": item.patientid,
            "index": np.int32(idx),
        }
        if self.is_survival:
            out["label"] = np.int32(item.survival["labels"])
            out["survival_month"] = np.float32(item.survival["survival_months"])
            out["censorship"] = np.float32(item.survival["censorship"])
        if self._cache is not None:
            size = self._nbytes(out)
            if size <= self._cache_budget:
                with self._cache_lock:
                    if idx not in self._cache:
                        self._cache[idx] = out
                        self._cache_bytes += size
                    while self._cache_bytes > self._cache_budget and self._cache:
                        _, evicted = self._cache.popitem(last=False)
                        self._cache_bytes -= self._nbytes(evicted)
        return out

    def get_event_and_censorship(self):
        return get_event_and_censorship(self.data_source)


def collate(samples: List[Dict]) -> Dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key == "patient_id":
            out[key] = list(vals)
        else:
            out[key] = np.stack(vals)
    return out


class EpochLoader:
    """Iterable over batches with optional shuffling and thread prefetch."""

    def __init__(
        self,
        dataset: SlideDataset,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch * 9973)
            rng.shuffle(idx)
        for start in range(0, n, self.batch_size):
            yield idx[start : start + self.batch_size]

    def __iter__(self):
        if self.prefetch <= 0:
            for batch_idx in self._index_batches():
                yield collate([self.dataset[int(i)] for i in batch_idx])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for batch_idx in self._index_batches():
                    q.put(collate([self.dataset[int(i)] for i in batch_idx]))
                q.put(_SENTINEL)
            except BaseException as exc:  # propagate to the consumer
                q.put(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()


class DataManager:
    """Builds the dataset + three loaders and exposes derived metadata
    (reference ``data_manager.py:241-344``)."""

    def __init__(self, cfg):
        self.cfg = cfg
        dataset = build_dataset(cfg)
        self.dataset = dataset

        cache = bool(getattr(cfg.DATALOADER, "CACHE", True))
        prefetch = int(cfg.TPU.PREFETCH)
        self.train_set = SlideDataset(cfg, dataset.train, cache=cache)
        self.val_set = (
            SlideDataset(cfg, dataset.val, cache=cache) if dataset.val else None
        )
        self.test_set = SlideDataset(cfg, dataset.test, cache=cache)

        seed = max(cfg.SEED, 0)
        self.train_loader = EpochLoader(
            self.train_set,
            cfg.DATALOADER.TRAIN.BATCH_SIZE,
            shuffle=cfg.DATALOADER.TRAIN.SAMPLER == "RandomSampler",
            seed=seed,
            prefetch=prefetch,
        )
        self.val_loader = (
            EpochLoader(
                self.val_set,
                cfg.DATALOADER.TEST.BATCH_SIZE,
                shuffle=False,
                prefetch=prefetch,
            )
            if self.val_set
            else None
        )
        self.test_loader = EpochLoader(
            self.test_set,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            shuffle=False,
            prefetch=prefetch,
        )

        self.num_classes = dataset.num_classes
        self.lab2cname = dataset.lab2cname

        # ---- omic metadata ------------------------------------------------
        self.omic_dim = None
        self.gene_group_indexes = None
        if dataset.train and dataset.train[0].molpath and osp.isfile(
            dataset.train[0].molpath
        ):
            mol0 = pd.read_csv(dataset.train[0].molpath)
            self.omic_dim = len(mol0)
            sig_path = cfg.DATASET.SIGNATURES
            if not sig_path:
                default = osp.join(
                    osp.abspath(osp.expanduser(cfg.DATASET.ROOT)),
                    "tcga_glioma",
                    "labels",
                    "signatures.csv",
                )
                sig_path = default if osp.isfile(default) else ""
            if sig_path:
                self.gene_group_indexes = load_gene_group_indexes(
                    sig_path, dataset.train[0].molpath
                )
        if self.gene_group_indexes is None and self.omic_dim:
            # fallback: even chunks (documented deviation — the reference
            # requires signatures.csv; we degrade gracefully without it)
            n_groups = cfg.MODEL.UMEML.PROTOTYPES
            chunk = self.omic_dim // n_groups
            self.gene_group_indexes = [
                list(range(g * chunk, (g + 1) * chunk)) for g in range(n_groups)
            ]

        self._omic_means = None

    @property
    def omic_sizes(self):
        if self.gene_group_indexes is None:
            return []
        return [len(g) for g in self.gene_group_indexes]

    def compute_omic_means(self) -> np.ndarray:
        """Mean molecular vector over the train split — used for in-sample
        omics-deletion imputation (reference ``trainer.py:286-291``)."""
        if self._omic_means is None:
            mols = [self.train_set[i]["mol"] for i in range(len(self.train_set))]
            self._omic_means = np.mean(np.stack(mols), axis=0)
        return self._omic_means

    def show_summary(self):
        ds = self.cfg.DATASET.NAME
        print(f"Dataset    {ds}")
        print(f"# classes  {self.num_classes}")
        print(f"# train    {len(self.train_set):,}")
        if self.val_set:
            print(f"# val      {len(self.val_set):,}")
        print(f"# test     {len(self.test_set):,}")
        if self.omic_dim:
            print(f"# genes    {self.omic_dim:,} (groups: {self.omic_sizes})")
