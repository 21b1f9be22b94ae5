"""Task networks wrapping zoo modules with classifiers — the role of the
reference's per-engine ``*_NET`` classes (e.g. ``engine/abmil.py:20-69``).

Each net maps a batch dict to logits; Survival heads always have 4 bins
(reference ``engine/abmil.py:40-42``).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchLinear
from .backbone import SNN, SNN_M
from .mil import ABMIL_MODULE, TransMIL_MODULE


def survival_num_classes(task: str, num_classes: int) -> int:
    return 4 if task == "Survival" else num_classes


class ABMIL_NET(nn.Module):
    num_classes: int
    path_input_dim: int = 512
    model_size_wsi: str = "small"
    dropout: float = 0.25

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> jnp.ndarray:
        f = ABMIL_MODULE(
            path_input_dim=self.path_input_dim,
            model_size_wsi=self.model_size_wsi,
            dropout=self.dropout,
            name="mil",
        )(batch["img"], valid=batch.get("img_mask"), deterministic=not train)
        return TorchLinear(self.num_classes, name="classifier")(f)


class TransMIL_NET(nn.Module):
    num_classes: int
    path_input_dim: int = 512
    seq_axis: object = None  # bag tokens sharded over this mesh axis
    sp_mode: str = "gather"  # "gather" | "ring" (TPU.SP_ATTENTION)

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> jnp.ndarray:
        f = TransMIL_MODULE(
            path_input_dim=self.path_input_dim,
            seq_axis=self.seq_axis,
            sp_mode=self.sp_mode,
            name="mil",
        )(
            batch["img"], valid=batch.get("img_mask"), deterministic=not train
        )
        return TorchLinear(self.num_classes, name="classifier")(f)


class SNN_NET(nn.Module):
    num_classes: int
    num_mol: int = 1000
    dropout: float = 0.1
    model_size_omic: str = "small"

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> jnp.ndarray:
        f = SNN(
            num_mol=self.num_mol,
            dropout=self.dropout,
            model_size_omic=self.model_size_omic,
            name="backbone",
        )(batch["mol"][:, : self.num_mol], deterministic=not train)
        return TorchLinear(self.num_classes, name="classifier")(f)


class SNNM_NET(nn.Module):
    num_classes: int
    num_mol: int = 50
    dropout: float = 0.1
    model_size_omic: str = "small"

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False) -> jnp.ndarray:
        f = SNN_M(
            num_mol=self.num_mol,
            dropout=self.dropout,
            model_size_omic=self.model_size_omic,
            name="backbone",
        )(batch["mol"], deterministic=not train)
        return TorchLinear(self.num_classes, name="classifier")(f)
