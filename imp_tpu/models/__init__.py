"""Model zoo registries (reference ``medmm/modeling/__init__.py``: 6
registries + builders, same config names)."""

from ..utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")
FUSION_REGISTRY = Registry("FUSION")
MIL_REGISTRY = Registry("MIL")
BACKBONE_REGISTRY = Registry("BACKBONE")
HEAD_REGISTRY = Registry("HEAD")

from .umeml import UMEML
from .umeml_gan import UMEML_GAN
from .mil import ABMIL_MODULE, TransMIL_MODULE
from .backbone import SNN, SNN_M


@MODEL_REGISTRY.register_as("umeml")
def _umeml_factory(cfg=None, num_classes=0, **kwargs):
    return UMEML(
        num_classes=num_classes,
        hidden=cfg.MODEL.HIDDEN_DIM,
        n_proto=cfg.MODEL.UMEML.PROTOTYPES,
        n_reg=cfg.MODEL.UMEML.REGISTERS,
        dropout=cfg.MODEL.DROPOUT,
        fusion=cfg.MODEL.FUSION,
    )


@MODEL_REGISTRY.register_as("umeml_gan")
def _umeml_gan_factory(cfg=None, num_classes=0, gene_group_indexes=(), sp_axis=None,
              sp_mode="gather", **kwargs):
    proto_initializer = None
    if cfg.MODEL.UMEML.PROTO_INIT == "plip":
        from .prototypes import plip_prototype_init

        proto_initializer = plip_prototype_init(
            cfg, cfg.MODEL.UMEML.PROTOTYPES, cfg.MODEL.HIDDEN_DIM
        )
    return UMEML_GAN(
        num_classes=num_classes,
        gene_group_indexes=tuple(tuple(g) for g in gene_group_indexes),
        hidden=cfg.MODEL.HIDDEN_DIM,
        n_proto=cfg.MODEL.UMEML.PROTOTYPES,
        n_reg=cfg.MODEL.UMEML.REGISTERS,
        dropout_rate=cfg.MODEL.DROPOUT,
        fusion=cfg.MODEL.FUSION,
        lambda_cyc=float(cfg.MODEL.UMEML.LAMBDA_CYC),
        topk=cfg.MODEL.UMEML.TOPK,
        kd_t=float(cfg.MODEL.UMEML.KD_T),
        proto_initializer=proto_initializer,
        sp_axis=sp_axis,
        sp_mode=sp_mode,
    )


@MODEL_REGISTRY.register_as("umeml_gan_plot")
def _umeml_gan_plot_factory(cfg=None, num_classes=0, gene_group_indexes=(), **kwargs):
    """Reference ``umeml_gan_plot.py``: same architecture as umeml_gan; at
    test time MBTRAIN additionally dumps per-sample path x omic similarity
    grids to ``plots/sim_<patient>.png`` (detected via the ``_plot`` suffix)."""
    return _umeml_gan_factory(
        cfg=cfg,
        num_classes=num_classes,
        gene_group_indexes=gene_group_indexes,
        **kwargs,
    )


@MIL_REGISTRY.register_as("abmil")
def abmil(path_input_dim=512, model_size_wsi="small", dropout=0.25, **kwargs):
    return ABMIL_MODULE(
        path_input_dim=path_input_dim, model_size_wsi=model_size_wsi, dropout=dropout
    )


@MIL_REGISTRY.register_as("transmil")
def transmil(path_input_dim=512, **kwargs):
    return TransMIL_MODULE(path_input_dim=path_input_dim)


@BACKBONE_REGISTRY.register_as("snn")
def snn(num_mol=1000, dropout=0.1, model_size_omic="small", **kwargs):
    return SNN(num_mol=num_mol, dropout=dropout, model_size_omic=model_size_omic)


@BACKBONE_REGISTRY.register_as("snnm")
def snnm(num_mol=50, dropout=0.1, model_size_omic="small", **kwargs):
    return SNN_M(num_mol=num_mol, dropout=dropout, model_size_omic=model_size_omic)


@BACKBONE_REGISTRY.register_as("clipomic")
def _clipomic_factory(num_mol=5, len_mol=200, model_size_omic="small", dropout=0.25, **kwargs):
    from .clipomic import CLIPOMIC

    return CLIPOMIC(
        num_mol=num_mol, len_mol=len_mol, model_size_omic=model_size_omic,
        dropout=dropout,
    )


def build_model(name, **kwargs):
    return MODEL_REGISTRY.get(name)(**kwargs)


def build_fusion(name, **kwargs):
    return FUSION_REGISTRY.get(name)(**kwargs)


def build_mil(name, **kwargs):
    return MIL_REGISTRY.get(name)(**kwargs)


def build_backbone(name, **kwargs):
    return BACKBONE_REGISTRY.get(name)(**kwargs)
