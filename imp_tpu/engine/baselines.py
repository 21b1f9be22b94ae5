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


@TRAINER_REGISTRY.register()
class CLIPOMIC(StandardTrainer):
    """CLIP-text-encoder omics baseline (reference ``engine/clipomic.py``)."""

    def build_network(self):
        cfg = self.cfg
        from flax import linen as nn
        from ..models.clipomic import CLIPOMIC as CLIPOMIC_MODULE
        from ..ops.attention import TorchLinear

        num_classes = self.network_num_classes()
        backbone = CLIPOMIC_MODULE(
            num_mol=5, len_mol=200, model_size_omic=cfg.MODEL.SIZE,
            dropout=cfg.MODEL.DROPOUT,
        )

        class CLIPOMIC_NET(nn.Module):
            @nn.compact
            def __call__(self, batch, train: bool = False):
                f = backbone(batch["mol"], deterministic=not train)
                return TorchLinear(num_classes, name="classifier")(f)

        return CLIPOMIC_NET()
