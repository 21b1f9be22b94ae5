from ..utils.registry import Registry

TRAINER_REGISTRY = Registry("TRAINER")


def build_trainer(cfg):
    from . import baselines, fusion_trainers, mbtrain  # noqa: F401  (register)
    from ..utils.registry import check_availability

    avail = list(TRAINER_REGISTRY.registered_names())
    check_availability(cfg.TRAINER.NAME, avail)
    if cfg.VERBOSE:
        print(f"Loading trainer: {cfg.TRAINER.NAME}")
    return TRAINER_REGISTRY.get(cfg.TRAINER.NAME)(cfg)
