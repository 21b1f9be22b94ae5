"""Batched greedy top-K path<->omic token pairing.

Replaces the reference's per-sample Python double loop with ``.item()``
cosine calls + ``np.argsort`` greedy matching
(``medmm/modeling/models/umeml_gan.py:123-221`` — its #1 hot loop) with a
fully vectorized fixed-shape computation: one cosine-similarity matmul and
K unrolled masked-argmax steps.  Greedy-over-sorted-pairs and iterative
masked argmax select identical pairs (each step picks the best pair whose
row and column are both untaken).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_similarity_matrix(
    a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """sim[b,i,j] = cos(a[b,i], b[b,j]) with torch F.cosine_similarity eps
    semantics (denominator clamped at eps)."""
    dots = jnp.einsum("bid,bjd->bij", a, b, preferred_element_type=jnp.float32)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    denom = jnp.maximum(na[:, :, None] * nb[:, None, :], eps)
    return dots / denom


def greedy_topk_pairs(
    sim: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy selection of k (row, col) pairs by descending similarity with
    row/col exclusivity (reference ``umeml_gan.py:173-186``).

    Returns (rows [B,k], cols [B,k]) in **selection order**.
    """
    b, p, o = sim.shape
    neg = -jnp.finfo(sim.dtype).max
    s = sim
    rows, cols = [], []
    for _ in range(k):  # k is tiny (3) — unrolled
        flat_idx = jnp.argmax(s.reshape(b, p * o), axis=-1)
        ip = flat_idx // o
        io = flat_idx % o
        rows.append(ip)
        cols.append(io)
        row_hit = jax.nn.one_hot(ip, p, dtype=bool)
        col_hit = jax.nn.one_hot(io, o, dtype=bool)
        s = jnp.where(row_hit[:, :, None] | col_hit[:, None, :], neg, s)
    return jnp.stack(rows, axis=1), jnp.stack(cols, axis=1)


def remove_indices_keep_order(
    tokens: jnp.ndarray, removed_idx: jnp.ndarray
) -> jnp.ndarray:
    """Drop the tokens at ``removed_idx`` (shape [B,k]) from ``tokens``
    ([B,N,D]) preserving original order — fixed output shape [B, N-k, D].

    Uses an order-preserving stable-sort compaction (removed tokens sort to
    the back) instead of the reference's Python list slicing
    (``umeml_gan.py:200-217``).
    """
    b, n, _ = tokens.shape
    k = removed_idx.shape[1]
    removed = jnp.any(
        jax.nn.one_hot(removed_idx, n, dtype=bool), axis=1
    )  # [B, N]
    order = jnp.argsort(removed.astype(jnp.int32), axis=1, stable=True)  # kept first
    kept = jnp.take_along_axis(tokens, order[:, : n - k, None], axis=1)
    return kept


def gather_tokens(tokens: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tokens [B,N,D], idx [B,k] -> [B,k,D]."""
    return jnp.take_along_axis(tokens, idx[..., None], axis=1)
