"""Multimodal fusion baseline trainers: MCAT, CMTA, Porpoise / ConCAT / ADD,
HFB — reference ``medmm/engine/{mcat,cmta,porpoise,concat,add,hfb}.py``.

The reference's stale-trainer bugs are fixed by spec (SURVEY.md §2.5
consistency note): parse_batch arity mismatches disappear (batches are
dicts) and CMTA's ``nn.L1Loss(a, b)`` misuse becomes a functional L1.
MCAT-family gradient accumulation (step every 32 batches,
ref ``mcat.py:175-193``) maps to ``optax.MultiSteps`` via OPTIM.GRAD_ACCUM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import TRAINER_REGISTRY
from .trainer import StandardTrainer
from ..models import FUSION_REGISTRY
from ..models.fusion import CMTA as CMTA_MODULE
from ..models.fusion import HFB as HFB_MODULE
from ..models.fusion import MCAT as MCAT_MODULE
from ..models.fusion import Porpoise as PORPOISE_MODULE
from ..ops.attention import TorchLinear

FUSION_REGISTRY.register_as("mcat")(MCAT_MODULE)
FUSION_REGISTRY.register_as("cmta")(CMTA_MODULE)
FUSION_REGISTRY.register_as("porpoise")(PORPOISE_MODULE)
FUSION_REGISTRY.register_as("hfb")(HFB_MODULE)


class FusionNet(nn.Module):
    """fusion module + task classifier (the reference's *_NET wrappers,
    e.g. ``engine/mcat.py:18-74``)."""

    fusion_module: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False):
        out = self.fusion_module(
            batch["img"],
            batch["mol"],
            path_valid=batch.get("img_mask"),
            deterministic=not train,
        )
        extras = {}
        if isinstance(out, tuple):
            out, extras = out
        logits = TorchLinear(self.num_classes, name="classifier")(out)
        return {"logits": logits, **(extras if isinstance(extras, dict) else {})}


class _FusionTrainer(StandardTrainer):
    fusion_name = ""
    fusion_kwargs: Dict = {}
    default_grad_accum = 1

    def check_cfg(self, cfg):
        if self.default_grad_accum > 1 and cfg.OPTIM.GRAD_ACCUM == 1:
            frozen = cfg.is_frozen()
            cfg.defrost()
            cfg.OPTIM.GRAD_ACCUM = self.default_grad_accum
            if frozen:
                cfg.freeze()

    def fusion_module(self):
        cfg = self.cfg
        kwargs = dict(self.fusion_kwargs)
        kwargs.setdefault("path_input_dim", cfg.DATASET.PATH.DIM)
        return FUSION_REGISTRY.get(self.fusion_name)(**kwargs)

    def build_network(self):
        return FusionNet(
            fusion_module=self.fusion_module(),
            num_classes=self.network_num_classes(),
        )


@TRAINER_REGISTRY.register()
class MCAT(_FusionTrainer):
    """Gradient accumulation every 32 steps (ref ``mcat.py:175-193``)."""

    fusion_name = "mcat"
    default_grad_accum = 32

    def fusion_module(self):
        cfg = self.cfg
        return MCAT_MODULE(
            fusion=cfg.MODEL.FUSION or "concat",
            path_input_dim=cfg.DATASET.PATH.DIM,
            omic_sizes=(200, 200, 200, 200, 200),
            model_size_wsi=cfg.MODEL.SIZE,
            model_size_omic=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class CMTA(_FusionTrainer):
    fusion_name = "cmta"

    def fusion_module(self):
        cfg = self.cfg
        return CMTA_MODULE(
            fusion=cfg.MODEL.FUSION or "concat",
            path_input_dim=cfg.DATASET.PATH.DIM,
            omic_sizes=(200, 200, 200, 200, 200),
        )

    def extra_loss(self, out, batch):
        # alignment L1 between encoder (detached) and decoder cls tokens
        # (ref engine/cmta.py — fixing the nn.L1Loss(a,b) misuse by spec)
        alpha = float(self.cfg.LOSS.CMTA_ALPHA)
        pe = jax.lax.stop_gradient(out["cls_token_pathomics_encoder"])
        ge = jax.lax.stop_gradient(out["cls_token_genomics_encoder"])
        sim_p = jnp.mean(jnp.abs(pe - out["cls_token_pathomics_decoder"]))
        sim_g = jnp.mean(jnp.abs(ge - out["cls_token_genomics_decoder"]))
        return alpha * (sim_p + sim_g)


@TRAINER_REGISTRY.register()
class Porpoise(_FusionTrainer):
    fusion_name = "porpoise"

    def fusion_module(self):
        cfg = self.cfg
        return PORPOISE_MODULE(
            fusion=cfg.MODEL.FUSION or "bilinear",
            omic_input_dim=min(1000, self.dm.omic_dim or 1000),
            path_input_dim=cfg.DATASET.PATH.DIM,
            model_size_wsi=cfg.MODEL.SIZE,
            model_size_omic=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class ConCAT(Porpoise):
    """Porpoise with concat fusion (ref ``engine/concat.py``)."""

    def fusion_module(self):
        cfg = self.cfg
        return PORPOISE_MODULE(
            fusion="concat",
            omic_input_dim=min(1000, self.dm.omic_dim or 1000),
            path_input_dim=cfg.DATASET.PATH.DIM,
            model_size_wsi=cfg.MODEL.SIZE,
            model_size_omic=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class ADD(Porpoise):
    """Porpoise with additive fusion (ref ``engine/add.py``)."""

    def fusion_module(self):
        cfg = self.cfg
        return PORPOISE_MODULE(
            fusion="add",
            omic_input_dim=min(1000, self.dm.omic_dim or 1000),
            path_input_dim=cfg.DATASET.PATH.DIM,
            model_size_wsi=cfg.MODEL.SIZE,
            model_size_omic=cfg.MODEL.SIZE,
        )


@TRAINER_REGISTRY.register()
class HFB(_FusionTrainer):
    fusion_name = "hfb"

    def fusion_module(self):
        cfg = self.cfg
        return HFB_MODULE(path_input_dim=cfg.DATASET.PATH.DIM)
