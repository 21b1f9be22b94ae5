"""WHO-2021 integrated-diagnosis labelers, survival binning, and k-fold
split writing (reference ``tools/label_gen.py`` and ``tools/kfold.py``),
as a library so the labeling logic is unit-testable.

Molecular-marker inputs: IDH status ("WT"/"Mutant"), 1p/19q codeletion
("codel"/"non-codel"), histology description, CDKN2A/B status ("-1"/"-2"
means homozygous deletion), and histological grade ("G2"/"G3").
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

DAYS_IN_MONTH = 30.44


def _is_g4_astro(His: str, CDKN: str) -> bool:
    return str(His) == "glioblastoma" or str(CDKN) in ("-1", "-2")


def diag_grading(IDH, p19q, His, CDKN, Grade) -> Optional[int]:
    """3-level grading {0: Grade 4, 1: Grade 3, 2: Grade 2}
    (reference ``label_gen.py:6-42``)."""
    if str(IDH) == "WT":
        return 0  # G4 GBM
    if str(IDH) == "Mutant":
        if str(p19q) == "codel":
            return 2 if Grade == "G2" else 1  # G2 / G3 Oligo
        if str(p19q) == "non-codel":
            if _is_g4_astro(His, CDKN):
                return 0  # G4 Astro
            if Grade == "G2":
                return 2
            if Grade == "G3":
                return 1
            return None
    return None


def diag_subtyping(IDH, p19q, His, CDKN, Grade) -> Optional[int]:
    """{0: GBM, 1: Astro, 2: Oligo} (reference ``label_gen.py:47-84``)."""
    if str(IDH) == "WT":
        return 0
    if str(IDH) == "Mutant":
        if str(p19q) == "codel":
            return 2
        if str(p19q) == "non-codel":
            if _is_g4_astro(His, CDKN):
                return 1
            if Grade in ("G2", "G3"):
                return 1
            return None
    return None


def diag_grading6(IDH, p19q, His, CDKN, Grade) -> Optional[int]:
    """6-class integrated diagnosis {0: G4 GBM, 1: G4 Astro, 2: G3 Astro,
    3: G2 Astro, 4: G3 Oligo, 5: G2 Oligo} (reference ``label_gen.py:85-121``)."""
    if str(IDH) == "WT":
        return 0
    if str(IDH) == "Mutant":
        if str(p19q) == "codel":
            return 5 if Grade == "G2" else 4
        if str(p19q) == "non-codel":
            if _is_g4_astro(His, CDKN):
                return 1
            if Grade == "G2":
                return 3
            if Grade == "G3":
                return 2
            return None
    return None


def diag_grading4(IDH, p19q, His, CDKN, Grade) -> Optional[int]:
    """4-class {0: G4 GBM, 1: G4 Astro, 2: G2/3 Astro, 3: Oligo}
    (reference ``label_gen.py:125-161``)."""
    if str(IDH) == "WT":
        return 0
    if str(IDH) == "Mutant":
        if str(p19q) == "codel":
            return 3
        if str(p19q) == "non-codel":
            if _is_g4_astro(His, CDKN):
                return 1
            if Grade in ("G2", "G3"):
                return 2
            return None
    return None


def survival_bins(
    patients_df: pd.DataFrame,
    n_bins: int = 4,
    eps: float = 1e-6,
    time_col: str = "OS.time",
    event_col: str = "OS",
    id_col: str = "bcr_patient_barcode",
) -> pd.DataFrame:
    """Quantile survival binning over uncensored patients, clipped to the
    global min/max, left-closed intervals (reference ``Survival_T``,
    ``label_gen.py:165-202``).  The raw event column is flipped so the
    output ``censorship`` is 1 = censored."""
    df = patients_df.copy()
    df["survival_months"] = df[time_col].apply(
        lambda x: round(float(x) / DAYS_IN_MONTH, 2) if pd.notna(x) else np.nan
    )
    df = df.replace("#N/A", pd.NA)
    df = df.dropna(subset=[time_col])
    df[event_col] = df[event_col].replace({0: 1, 1: 0})  # -> censorship
    uncensored = df[df[event_col] == 0]
    _, q_bins = pd.qcut(uncensored["survival_months"], q=n_bins, retbins=True, labels=False)
    q_bins[-1] = df["survival_months"].max() + eps
    q_bins[0] = df["survival_months"].min() - eps
    disc_labels, _ = pd.cut(
        df["survival_months"], bins=q_bins, retbins=True, labels=False,
        right=False, include_lowest=True,
    )
    out = pd.DataFrame()
    out.insert(0, "patients", df[id_col].values)
    out.insert(1, "labels", disc_labels.values.astype(int))
    out.insert(2, "survival_months", df["survival_months"].values)
    out.insert(3, "censorship", df[event_col].values.astype(int))
    return out


def write_kfold_splits(
    df: pd.DataFrame,
    out_dir: str,
    task: str,
    n_splits: int = 5,
    seed: int = 42,
    extra_cols=(),
) -> None:
    """5-fold split CSVs ``{task}_{train,test}_{fold}.csv``
    (reference ``tools/kfold.py:13-27``; KFold(shuffle=True, seed 42))."""
    import os

    from sklearn.model_selection import KFold

    os.makedirs(out_dir, exist_ok=True)
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    idx = np.arange(len(df))
    cols = ["features", "labels", *extra_cols]
    for fold, (train_idx, test_idx) in enumerate(kf.split(idx), start=1):
        df.iloc[train_idx][cols].to_csv(
            f"{out_dir}/{task}_train_{fold}.csv", index=False
        )
        df.iloc[test_idx][cols].to_csv(
            f"{out_dir}/{task}_test_{fold}.csv", index=False
        )
