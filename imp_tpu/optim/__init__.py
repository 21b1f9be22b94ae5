from .builders import build_optimizer, build_lr_schedule, lr_at_epoch

__all__ = ["build_optimizer", "build_lr_schedule", "lr_at_epoch"]
