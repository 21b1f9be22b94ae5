"""Survival / classification losses (reference ``medmm/loss/loss.py``).

All losses are pure jnp functions usable inside the jitted train step.
Numerics match the reference formulas exactly:

* :func:`nll_loss` — discrete-time survival NLL over hazards
  (ref ``loss.py:8-26``)
* :func:`nll_loss_new` — Zadeh & Schmid (2020) NLL over raw logits; the loss
  used by the UMEML configs (ref ``loss.py:28-95``)
* :func:`ce_surv_loss` — survival CE variant (ref ``loss.py:98-113``)
* :func:`cox_loss` — Cox partial likelihood with a vectorized risk-set
  matrix instead of the O(B^2) python loop (ref ``loss.py:178-192``)
* :func:`kd_loss` — temperature-scaled KL self-distillation
  (ref ``models/umeml_gan.py:594-598``)
* :func:`cca_loss` — 1 / mean singular value of the std-normalized
  cross-covariance (ref ``engine/trainer.py:46-58``)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

LOSS_REGISTRY = Registry("LOSS")


def hazards_to_survival(hazards: jnp.ndarray) -> jnp.ndarray:
    """S = cumprod(1 - h) along the time-bin axis."""
    return jnp.cumprod(1.0 - hazards, axis=1)


def _gather_bin(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x[i, y[i]] as a column vector."""
    return jnp.take_along_axis(x, y, axis=1)


def nll_loss(
    hazards: jnp.ndarray,
    S: Optional[jnp.ndarray],
    Y: jnp.ndarray,
    c: jnp.ndarray,
    alpha: float = 0.4,
    eps: float = 1e-7,
) -> jnp.ndarray:
    batch = Y.shape[0]
    Y = Y.reshape(batch, 1).astype(jnp.int32)
    c = c.reshape(batch, 1).astype(hazards.dtype)
    if S is None:
        S = hazards_to_survival(hazards)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)
    uncensored = -(1.0 - c) * (
        jnp.log(jnp.clip(_gather_bin(S_padded, Y), eps, None))
        + jnp.log(jnp.clip(_gather_bin(hazards, Y), eps, None))
    )
    censored = -c * jnp.log(jnp.clip(_gather_bin(S_padded, Y + 1), eps, None))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return loss.mean()


def nll_loss_new(
    logits: jnp.ndarray,
    Y: jnp.ndarray,
    c: jnp.ndarray,
    alpha: float = 0.0,
    eps: float = 1e-7,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Zadeh & Schmid NLL over raw logits (hazards = sigmoid(logits))."""
    batch = logits.shape[0]
    Y = Y.reshape(batch, 1).astype(jnp.int32)
    c = c.reshape(batch, 1).astype(logits.dtype)
    hazards = jax.nn.sigmoid(logits)
    S = hazards_to_survival(hazards)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)
    s_prev = jnp.clip(_gather_bin(S_padded, Y), eps, None)
    h_this = jnp.clip(_gather_bin(hazards, Y), eps, None)
    s_this = jnp.clip(_gather_bin(S_padded, Y + 1), eps, None)
    uncensored = -(1.0 - c) * (jnp.log(s_prev) + jnp.log(h_this))
    censored = -c * jnp.log(s_this)
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(f"Bad reduction: {reduction}")


def ce_surv_loss(
    hazards: jnp.ndarray,
    S: Optional[jnp.ndarray],
    Y: jnp.ndarray,
    c: jnp.ndarray,
    alpha: float = 0.4,
    eps: float = 1e-7,
) -> jnp.ndarray:
    batch = Y.shape[0]
    Y = Y.reshape(batch, 1).astype(jnp.int32)
    c = c.reshape(batch, 1).astype(hazards.dtype)
    if S is None:
        S = hazards_to_survival(hazards)
    S_padded = jnp.concatenate([jnp.ones_like(c), S], axis=1)
    reg = -(1.0 - c) * (
        jnp.log(_gather_bin(S_padded, Y) + eps)
        + jnp.log(jnp.clip(_gather_bin(hazards, Y), eps, None))
    )
    s_y = jnp.clip(_gather_bin(S, Y), eps, None)
    ce_l = -c * jnp.log(s_y) - (1.0 - c) * jnp.log(1.0 - s_y)
    loss = (1.0 - alpha) * ce_l + alpha * reg
    return loss.mean()


def cox_loss(hazards: jnp.ndarray, times: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Cox partial likelihood; risk set R[i,j] = (t_j >= t_i), vectorized."""
    theta = hazards.reshape(-1)
    risk_set = (times[None, :] >= times[:, None]).astype(theta.dtype)
    log_risk = jnp.log(jnp.sum(jnp.exp(theta)[None, :] * risk_set, axis=1))
    return -jnp.mean((theta - log_risk) * (1.0 - c))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
    return nll.mean()


def kd_loss(
    student_logits: jnp.ndarray, teacher_logits: jnp.ndarray, T: float = 5.0
) -> jnp.ndarray:
    """KL(softmax(teacher/T) || softmax(student/T)) * T^2, batchmean."""
    teacher = jax.lax.stop_gradient(teacher_logits)
    log_p_s = jax.nn.log_softmax(student_logits / T, axis=1)
    p_t = jax.nn.softmax(teacher / T, axis=1)
    log_p_t = jax.nn.log_softmax(teacher / T, axis=1)
    kl = jnp.sum(p_t * (log_p_t - log_p_s), axis=1)
    return kl.mean() * (T * T)


def cca_loss(X: jnp.ndarray, Y: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """1 / mean singular value of the standardized cross-covariance."""
    Xc = X - X.mean(axis=0)
    Yc = Y - Y.mean(axis=0)
    Xs = Xc / Xc.std(axis=0)
    Ys = Yc / Yc.std(axis=0)
    C = Xs.T @ Ys / (X.shape[0] - 1)
    s = jnp.linalg.svd(C, compute_uv=False)
    return 1.0 / (s.sum() / s.size + epsilon)


def kl_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """sum-reduced KL(softmax(y) || softmax(y_hat)) — reference ``KLLoss``
    (``medmm/loss/loss.py:195-197``; defined but unused by live configs)."""
    p = jax.nn.softmax(y, axis=-1)
    return jnp.sum(p * (jnp.log(p) - jax.nn.log_softmax(y_hat, axis=-1)))


def cosine_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine_similarity(y, y_hat) per row — reference ``CosineLoss``
    (``medmm/loss/loss.py:200-202``)."""
    return 1.0 - _cosine_sim(y, y_hat)


def _cosine_sim(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    na = jnp.linalg.norm(a, axis=1).clip(eps)
    nb = jnp.linalg.norm(b, axis=1).clip(eps)
    return jnp.sum(a * b, axis=1) / (na * nb)


def orthogonal_loss(
    P: jnp.ndarray,
    P_hat: jnp.ndarray,
    G: jnp.ndarray,
    G_hat: jnp.ndarray,
    gamma: float = 0.5,
) -> jnp.ndarray:
    """Reference ``OrthogonalLoss`` (``medmm/loss/loss.py:205-221``): pull
    reconstructions toward their (detached) sources, push cross-modal
    directions apart. Per-row vector, like the torch module."""
    P_d = jax.lax.stop_gradient(P)
    G_d = jax.lax.stop_gradient(G)
    pos = (1.0 - jnp.abs(_cosine_sim(P_d, P_hat))) + (
        1.0 - jnp.abs(_cosine_sim(G_d, G_hat))
    )
    neg = (
        jnp.abs(_cosine_sim(P, G))
        + jnp.abs(_cosine_sim(P_d, G_hat))
        + jnp.abs(_cosine_sim(G_d, P_hat))
    )
    return pos + gamma * neg


def similarity_alignment_loss(
    p_proto_flat: jnp.ndarray, h_omic_flat: jnp.ndarray
) -> jnp.ndarray:
    """MSE between row-normalized Gram matrices of the two modalities — the
    per-batch loss of the CCA epoch (ref ``engine/mbtrain.py:190-199,491-493``)."""

    def normed_gram(z):
        g = z @ z.T
        norm = jnp.linalg.norm(g, axis=1, keepdims=True)
        return g / norm

    gp = normed_gram(p_proto_flat)
    gh = normed_gram(h_omic_flat)
    return jnp.mean((gp - gh) ** 2)


# ---------------------------------------------------------------------------
# registry wrappers (name-compatible with the reference LOSS_REGISTRY)
# ---------------------------------------------------------------------------


class NLLSurvLoss:
    def __init__(self, alpha: float = 0.0, **kw):
        self.alpha = alpha

    def __call__(self, hazards, S, Y, c, alpha=None):
        return nll_loss(hazards, S, Y, c, self.alpha if alpha is None else alpha)


class NLLSurvLoss_NEW:
    def __init__(self, alpha: float = 0.0, eps: float = 1e-7, reduction: str = "sum"):
        self.alpha = alpha
        self.eps = eps
        self.reduction = reduction

    def __call__(self, logits, Y, c):
        # the reference passes the model's output tuple and uses logits[0]
        if isinstance(logits, (tuple, list)):
            logits = logits[0]
        return nll_loss_new(logits, Y, c, self.alpha, self.eps, self.reduction)


class CrossEntropySurvLoss:
    def __init__(self, alpha: float = 0.15, **kw):
        self.alpha = alpha

    def __call__(self, hazards, S, Y, c, alpha=None):
        return ce_surv_loss(hazards, S, Y, c, self.alpha if alpha is None else alpha)


class CoxSurvLoss:
    def __init__(self, **kw):
        pass

    def __call__(self, hazards, times, c, **kw):
        return cox_loss(hazards, times, c)


class CrossEntropyLoss:
    def __init__(self, alpha: float = 0.15, **kw):
        self.alpha = alpha

    def __call__(self, X, Y):
        if isinstance(X, (tuple, list)):
            X = X[0]
        return cross_entropy(X, Y)


LOSS_REGISTRY.register_as("nllsurvloss")(NLLSurvLoss)
LOSS_REGISTRY.register_as("nllsurvloss_new")(NLLSurvLoss_NEW)
LOSS_REGISTRY.register_as("cesurvloss")(CrossEntropySurvLoss)
LOSS_REGISTRY.register_as("coxsurvloss")(CoxSurvLoss)
LOSS_REGISTRY.register_as("celoss")(CrossEntropyLoss)


def build_loss(name: str, **kwargs):
    cls = LOSS_REGISTRY.get(name)
    try:
        return cls(**kwargs)
    except TypeError:
        return cls()
