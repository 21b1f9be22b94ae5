"""Smoke/parity tests for the auxiliary ops + metrics extras."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imp_tpu.evaluation import compute_accuracy, compute_distance_matrix
from imp_tpu.ops import (
    create_onehot,
    distributed_sinkhorn,
    ema_tree_update,
    linear_rampup,
    momentum_update,
    sharpen_prob,
    sigmoid_rampup,
)


def test_compute_accuracy_topk():
    out = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    tgt = jnp.asarray([1, 0, 1])  # third sample: top1 wrong, top2 right
    top1, top2 = compute_accuracy(out, tgt, topks=(1, 2))
    assert float(top1) == pytest.approx(100 * 2 / 3)
    assert float(top2) == pytest.approx(100.0)


def test_distance_matrix():
    x = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    d = compute_distance_matrix(x, x, "euclidean")
    np.testing.assert_allclose(np.asarray(d), [[0, 2], [2, 0]], atol=1e-6)
    c = compute_distance_matrix(x, x, "cosine")
    np.testing.assert_allclose(np.asarray(c), [[0, 1], [1, 0]], atol=1e-6)


def test_sharpen_and_rampups():
    p = jnp.asarray([[0.5, 0.5], [0.9, 0.1]])
    s = sharpen_prob(p, temperature=0.5)
    assert float(s[1, 0]) > 0.9  # sharpened toward the mode
    assert sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert sigmoid_rampup(10, 10) == 1.0
    assert linear_rampup(5, 10) == 0.5


def test_momentum_and_ema():
    assert float(momentum_update(1.0, 0.0, 0.9)) == pytest.approx(0.9)
    tree = {"a": jnp.ones(3)}
    ema = {"a": jnp.zeros(3)}
    out = ema_tree_update(tree, ema, alpha=0.5)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.5)


def test_sinkhorn_hard_assignment():
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    L, idx = distributed_sinkhorn(out, jax.random.PRNGKey(0))
    assert L.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(L.sum(axis=1)), 1.0, atol=1e-5)
    assert idx.shape == (16,)


def test_onehot():
    oh = create_onehot(jnp.asarray([0, 2]), 3)
    np.testing.assert_allclose(np.asarray(oh), [[1, 0, 0], [0, 0, 1]])
