"""Optimizers + epoch-stepped LR schedules as optax transforms.

Matches the reference's ``medmm/optim/optimizer.py:13-142`` (adam/amsgrad/
sgd/rmsprop/radam/adamw; note torch ``Adam(weight_decay=w)`` is *coupled* L2
— decay is added to the gradient before the moments) and
``medmm/optim/lr_scheduler.py`` (single_step / multi_step / cosine stepped
**per epoch**, wrapped by constant/linear warmup).

The schedule is a pure function of the optimizer-update index; the trainer
passes ``updates_per_epoch`` so per-epoch stepping is reproduced exactly.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Callable

import optax


def lr_at_epoch(optim_cfg, epoch: int) -> float:
    """LR used during ``epoch`` (0-indexed), replicating the torch scheduler
    chain: warmup wrapper + successor with WARMUP_RECOUNT=True."""
    base_lr = float(optim_cfg.LR)
    name = optim_cfg.LR_SCHEDULER
    stepsize = optim_cfg.STEPSIZE
    gamma = float(optim_cfg.GAMMA)
    max_epoch = int(optim_cfg.MAX_EPOCH)
    W = int(optim_cfg.WARMUP_EPOCH)

    if W > 0 and epoch < W:
        if optim_cfg.WARMUP_TYPE == "constant":
            return float(optim_cfg.WARMUP_CONS_LR)
        if optim_cfg.WARMUP_TYPE == "linear":
            if epoch == 0:
                return float(optim_cfg.WARMUP_MIN_LR)
            return base_lr * epoch / W
        raise ValueError(optim_cfg.WARMUP_TYPE)

    # successor epoch index: at the first post-warmup epoch the torch warmup
    # wrapper serves the successor's *initial* (un-stepped) lr, so the
    # successor lags the epoch count by exactly W
    se = epoch - W if W > 0 else epoch

    if name == "single_step":
        ss = stepsize[-1] if isinstance(stepsize, (list, tuple)) else stepsize
        ss = int(ss)
        if ss <= 0:
            ss = max_epoch
        return base_lr * gamma ** (se // ss)
    if name == "multi_step":
        milestones = sorted(int(s) for s in stepsize)
        return base_lr * gamma ** bisect_right(milestones, se)
    if name == "cosine":
        return base_lr * (1 + math.cos(math.pi * se / max_epoch)) / 2
    raise ValueError(f"scheduler must be one of single_step/multi_step/cosine, got {name}")


def build_lr_schedule(optim_cfg, updates_per_epoch: int) -> Callable[[int], float]:
    def schedule(count):
        import jax.numpy as jnp

        epoch = count // updates_per_epoch
        # build a small table of per-epoch lrs and index it (jit-friendly)
        max_epoch = int(optim_cfg.MAX_EPOCH)
        table = jnp.asarray(
            [lr_at_epoch(optim_cfg, e) for e in range(max_epoch + 1)]
        )
        idx = jnp.clip(epoch, 0, max_epoch)
        return table[idx]

    return schedule


def build_optimizer(
    optim_cfg,
    updates_per_epoch: int = 1,
    learning_rate: float | Callable | None = None,
    decay_mask=None,
) -> optax.GradientTransformation:
    """optax equivalent of reference ``build_optimizer``+``build_lr_scheduler``.

    ``learning_rate`` overrides the schedule (e.g. the CCA epoch's fixed
    Adam(1e-3), ref ``engine/trainer.py:682``).  ``decay_mask`` restricts the
    coupled L2 term to a parameter subset (torch only decays params that
    received gradients; see UMEML_GAN trainer notes).
    """
    name = optim_cfg.NAME
    wd = float(optim_cfg.WEIGHT_DECAY)
    b1, b2 = float(optim_cfg.ADAM_BETA1), float(optim_cfg.ADAM_BETA2)
    momentum = float(optim_cfg.MOMENTUM)

    if learning_rate is None:
        lr = build_lr_schedule(optim_cfg, updates_per_epoch)
    else:
        lr = learning_rate

    def _decay():
        if not wd:
            return optax.identity()
        t = optax.add_decayed_weights(wd)
        return optax.masked(t, decay_mask) if decay_mask is not None else t

    if name == "adam":
        # torch Adam: coupled L2 (decay added to the gradient pre-moments)
        return optax.chain(
            _decay(),
            optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
            optax.scale_by_learning_rate(lr),
        )
    if name == "amsgrad":
        return optax.chain(
            _decay(),
            optax.scale_by_amsgrad(b1=b1, b2=b2, eps=1e-8),
            optax.scale_by_learning_rate(lr),
        )
    if name == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=1e-8, weight_decay=wd)
    if name == "radam":
        # the reference RAdam (radam.py:110-126) applies weight decay
        # DECOUPLED (p -= wd*lr*p, not via the gradient), unlike its Adam
        return optax.chain(
            optax.scale_by_radam(b1=b1, b2=b2, eps=1e-8),
            _decay(),
            optax.scale_by_learning_rate(lr),
        )
    if name == "sgd":
        return optax.chain(
            _decay(),
            optax.trace(
                decay=momentum, nesterov=bool(optim_cfg.SGD_NESTEROV)
            )
            if momentum
            else optax.identity(),
            optax.scale_by_learning_rate(lr),
        )
    if name == "rmsprop":
        return optax.chain(
            _decay(),
            optax.scale_by_rms(decay=float(optim_cfg.RMSPROP_ALPHA), eps=1e-8),
            optax.trace(decay=momentum) if momentum else optax.identity(),
            optax.scale_by_learning_rate(lr),
        )
    raise ValueError(f"Unknown optimizer: {name}")
