"""Auxiliary ops from the reference that sit outside the live training path
(reference ``medmm/modeling/ops/utils.py``: sinkhorn, EMA, sharpening,
ramp-ups) — provided for capability parity with jnp semantics."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sharpen_prob(p: jnp.ndarray, temperature: float = 2.0) -> jnp.ndarray:
    """Probability sharpening (reference ``ops/utils.py:11-16``)."""
    p = p ** (1.0 / temperature)
    return p / p.sum(axis=1, keepdims=True)


def create_onehot(label: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(label, num_classes)


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential ramp-up from https://arxiv.org/abs/1610.02242
    (reference ``ops/utils.py:42-55``)."""
    if rampup_length == 0:
        return 1.0
    current = min(max(current, 0.0), rampup_length)
    phase = 1.0 - current / rampup_length
    return float(math.exp(-5.0 * phase * phase))


def linear_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    return float(min(max(current / rampup_length, 0.0), 1.0))


def momentum_update(old_value, new_value, momentum: float):
    """EMA update (reference ``ops/utils.py:138-144``)."""
    return momentum * old_value + (1.0 - momentum) * new_value


def ema_tree_update(params, ema_params, alpha: float):
    """EMA over a parameter pytree (reference ``ops/utils.py:74-83``)."""
    return jax.tree_util.tree_map(
        lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, params
    )


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def distributed_sinkhorn(
    out: jnp.ndarray,
    rng_key,
    sinkhorn_iterations: int = 3,
    epsilon: float = 0.05,
    tau: float = 0.5,
):
    """Sinkhorn cluster assignment with gumbel-softmax hard assignment
    (reference ``ops/utils.py:151-174``)."""
    L = jnp.exp(out / epsilon).T  # K x B
    B = L.shape[1]
    K = L.shape[0]
    L = L / jnp.sum(L)
    for _ in range(sinkhorn_iterations):
        L = L / jnp.sum(L, axis=1, keepdims=True) / K
        L = L / jnp.sum(L, axis=0, keepdims=True) / B
    L = (L * B).T  # B x K

    indexes = jnp.argmax(L, axis=1)
    # gumbel-softmax hard assignment (straight-through)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng_key, L.shape) + 1e-20) + 1e-20)
    y_soft = jax.nn.softmax((L + gumbel) / tau, axis=1)
    hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=1), L.shape[1])
    L_hard = hard + y_soft - jax.lax.stop_gradient(y_soft)
    return L_hard, indexes
