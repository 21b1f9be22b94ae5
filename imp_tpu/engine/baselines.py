"""Unimodal baseline trainers: ABMIL / TransMIL (pathology), SNN / SNNM
(genomics) — reference ``medmm/engine/{abmil,transmil,snn,snnm}.py``."""

from __future__ import annotations

from . import TRAINER_REGISTRY
from .trainer import StandardTrainer
from ..models.nets import ABMIL_NET, SNN_NET, SNNM_NET, TransMIL_NET


@TRAINER_REGISTRY.register()
class ABMIL(StandardTrainer):
    def build_network(self):
        cfg = self.cfg
        return ABMIL_NET(
            num_classes=self.network_num_classes(),
            path_input_dim=cfg.DATASET.PATH.DIM,
            model_size_wsi=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class TransMIL(StandardTrainer):
    def build_network(self):
        cfg = self.cfg
        return TransMIL_NET(
            num_classes=self.network_num_classes(),
            path_input_dim=cfg.DATASET.PATH.DIM,
        )


@TRAINER_REGISTRY.register()
class SNN(StandardTrainer):
    def build_network(self):
        cfg = self.cfg
        num_mol = min(1000, self.dm.omic_dim or 1000)
        return SNN_NET(
            num_classes=self.network_num_classes(),
            num_mol=num_mol,
            dropout=cfg.MODEL.DROPOUT,
            model_size_omic=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class SNNM(StandardTrainer):
    def build_network(self):
        cfg = self.cfg
        return SNNM_NET(
            num_classes=self.network_num_classes(),
            num_mol=50,
            dropout=cfg.MODEL.DROPOUT,
            model_size_omic=cfg.MODEL.SIZE,
        )
