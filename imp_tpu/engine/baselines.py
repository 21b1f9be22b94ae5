"""Unimodal baseline trainers: ABMIL / TransMIL (pathology), SNN / SNNM
(genomics) — reference ``medmm/engine/{abmil,transmil,snn,snnm}.py``."""

from __future__ import annotations

from . import TRAINER_REGISTRY
from .trainer import StandardTrainer, validated_sp_mode
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
    def network_seq_axis(self):
        # opt-in sequence parallelism: TPU.MESH_AXES=("data","seq") shards
        # the bag tokens; the TransLayers run query-banded exact attention
        return "seq" if int(self.mesh.shape.get("seq", 1)) > 1 else None

    def build_network(self):
        cfg = self.cfg
        return TransMIL_NET(
            num_classes=self.network_num_classes(),
            path_input_dim=cfg.DATASET.PATH.DIM,
            seq_axis=getattr(self, "_net_seq_axis", None),
            sp_mode=validated_sp_mode(cfg),
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


#: text-tower param subtrees inside the CLIPOMIC backbone — the reference
#: freezes everything named ``omic_encoder`` (the CLIP text transformer,
#: positional embedding, ln_final, text_projection; ref
#: ``engine/clipomic.py:124-126``) and keeps the token-embedding rows as
#: frozen buffers (ref ``backbone/clipomic.py:70-72``)
CLIP_TEXT_FROZEN = (
    "resblocks_",
    "ln_final",
    "positional_embedding",
    "text_projection",
    "token_embedding",
)


@TRAINER_REGISTRY.register()
class CLIPOMIC(StandardTrainer):
    """CLIP-text-encoder omics baseline (reference ``engine/clipomic.py``).

    When ``MODEL.BACKBONE.CLIP_CHECKPOINT`` points at an OpenAI CLIP torch
    state_dict, the text tower loads those weights (the reference downloads
    them, ref ``engine/clipomic.py:18-33``); the tower is frozen either way
    — only ``omic_fc``, the attention pool, ``rho`` and the classifier
    train, exactly the reference's requires_grad partition."""

    def build_network(self):
        cfg = self.cfg
        from flax import linen as nn
        from ..models.clipomic import CLIPOMIC as CLIPOMIC_MODULE
        from ..ops.attention import TorchLinear

        num_classes = self.network_num_classes()
        num_mol = 5
        # the reference hardcodes len_mol=200 and reshapes G/num_mol, which
        # only agrees at G=1000 — generalize to the dataset's gene count
        len_mol = max(1, (self.dm.omic_dim or 1000) // num_mol)
        backbone_kwargs = dict(
            num_mol=num_mol, len_mol=len_mol, model_size_omic=cfg.MODEL.SIZE,
            dropout=cfg.MODEL.DROPOUT,
            width=cfg.MODEL.BACKBONE.TEXT_WIDTH,
            heads=cfg.MODEL.BACKBONE.TEXT_HEADS,
            layers=cfg.MODEL.BACKBONE.TEXT_LAYERS,
            vocab_size=cfg.MODEL.BACKBONE.TEXT_VOCAB,
            context_length=cfg.MODEL.BACKBONE.TEXT_CONTEXT,
        )

        class CLIPOMIC_NET(nn.Module):
            @nn.compact
            def __call__(self, batch, train: bool = False):
                f = CLIPOMIC_MODULE(
                    **backbone_kwargs, name="genomic_backbone"
                )(batch["mol"], deterministic=not train)
                return TorchLinear(num_classes, name="classifier")(f)

        return CLIPOMIC_NET()

    def init_network_params(self, params):
        path = self.cfg.MODEL.BACKBONE.CLIP_CHECKPOINT
        if not path:
            print(
                "CLIPOMIC: no MODEL.BACKBONE.CLIP_CHECKPOINT — text tower "
                "stays randomly initialized (frozen regardless)"
            )
            return params
        import jax
        import jax.numpy as jnp
        import torch

        from ..models.clip import convert_torch_clip_state

        state = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        _, txt = convert_torch_clip_state(state, self.cfg.MODEL.BACKBONE.CLIP)
        backbone = dict(params["params"]["genomic_backbone"])
        for key, value in txt["params"].items():
            assert key in backbone, f"unexpected CLIP text param {key}"
            value = jax.tree_util.tree_map(jnp.asarray, value)
            want = jax.tree_util.tree_map(jnp.shape, backbone[key])
            got = jax.tree_util.tree_map(jnp.shape, value)
            assert want == got, f"CLIP text param {key}: {got} != {want}"
            backbone[key] = value
        print(f"CLIPOMIC: loaded pretrained CLIP text tower from {path}")
        out = dict(params)
        out["params"] = dict(params["params"])
        out["params"]["genomic_backbone"] = backbone
        return out

    def param_labels(self, params):
        import jax

        def label(path, _):
            keys = [getattr(k, "key", str(k)) for k in path]
            in_backbone = "genomic_backbone" in keys
            frozen = in_backbone and any(
                str(k).startswith(pref) for k in keys for pref in CLIP_TEXT_FROZEN
            )
            return "frozen" if frozen else "train"

        return jax.tree_util.tree_map_with_path(label, params)
