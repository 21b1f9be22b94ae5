"""Top-k accuracy + pairwise distances (reference ``medmm/metrics/``)."""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def compute_accuracy(output, target, topks: Sequence[int] = (1,)) -> List[jnp.ndarray]:
    """Top-k accuracies in percent (reference ``metrics/accuracy.py:1-30``)."""
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    maxk = max(topks)
    batch_size = target.shape[0]
    if output.ndim == 1:
        output = output[None, :]
    # indices of the top-maxk classes per row
    pred = jnp.argsort(output, axis=1)[:, ::-1][:, :maxk]  # [B, maxk]
    correct = pred == target[:, None]
    res = []
    for k in topks:
        acc = correct[:, :k].sum() * (100.0 / batch_size)
        res.append(acc)
    return res


def euclidean_squared_distance(x, y) -> jnp.ndarray:
    """Pairwise squared euclidean distances (reference ``metrics/distance.py``)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xx = (x**2).sum(axis=1, keepdims=True)
    yy = (y**2).sum(axis=1, keepdims=True).T
    return xx + yy - 2.0 * x @ y.T


def cosine_distance(x, y) -> jnp.ndarray:
    """1 - cosine similarity, pairwise."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-12)
    return 1.0 - xn @ yn.T


def compute_distance_matrix(x, y, metric: str = "euclidean") -> jnp.ndarray:
    if metric == "euclidean":
        return euclidean_squared_distance(x, y)
    if metric == "cosine":
        return cosine_distance(x, y)
    raise ValueError(f"Unknown distance metric: {metric}")
