"""Tensor (model) parallelism for the CLIP/PLIP encoder towers.

A NEW capability beyond reference parity (the reference's only multi-device
mode is single-process ``nn.DataParallel``, ``medmm/engine/trainer.py:483-486``;
its vendored CLIP, ``clip/model.py:202-236``, always runs whole-model on one
GPU).  Here the ViT image tower — the FLOPs-dominant component of the
pipeline (offline WSI patch encoding, ref ``tools/clip_feature.py:47-54``) —
runs Megatron-style over a ``model`` mesh axis, composing with the existing
``data`` axis:

* **attention**: the packed qkv projection is split head-wise (each device
  owns ``heads/tp`` heads end-to-end), the output projection is row-split,
  and one ``psum`` over the model axis reassembles the residual branch;
* **MLP**: ``c_fc`` column-split, ``c_proj`` row-split, one ``psum``;
* everything token-local (patchify, embeddings, LayerNorms, final
  projection) stays replicated — LN statistics are over the (replicated)
  feature axis, so no extra collectives are needed.

Two collectives per transformer block, both riding ICI; per-device weight
memory for the blocks drops by ``1/tp`` — the axis that matters for
ViT-L/RN50x64-scale towers or for serving many towers per chip.

The flagship UMEML heads (hidden 256, ~10-20M params) stay data-parallel on
purpose: at that scale a model axis only adds latency.

Used by ``tools/clip_feature.py --tp`` and ``__graft_entry__.dryrun_multichip``
(dp x tp phase); parity vs the single-device flax tower is tested in
``tests/test_tensor_parallel.py``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _np(x):
    return np.asarray(x)


def _chunk(arr, tp: int, axis: int):
    """[tp, ...] stack of ``arr`` split into tp equal chunks along ``axis``."""
    return np.stack(np.split(_np(arr), tp, axis=axis), axis=0)


def split_vision_params_tp(params: Dict, tp: int) -> Dict:
    """Split flax :class:`~imp_tpu.models.clip.VisionTransformer` params for
    ``tp``-way tensor parallelism.

    Returns ``{"rep": <replicated leaves>, "shard": <leaves with a leading
    [tp] shard axis>}``.  The qkv projection is split head-wise (contiguous
    head-major column chunks — the flax module packs ``q|k|v`` each
    head-major, so chunk ``j`` holds heads ``[j*h/tp, (j+1)*h/tp)``), the
    attention output projection row-wise, the MLP column/row-wise.
    """
    p = params["params"] if "params" in params else params
    rep: Dict = {}
    shard: Dict = {}
    for key, val in p.items():
        if not key.startswith("resblocks_"):
            rep[key] = val
            continue
        attn, mlp = val["attn"], val["mlp"]
        w = _np(attn["in_proj_weight"])  # [d, 3d]
        b = _np(attn["in_proj_bias"])  # [3d]
        d = w.shape[0]
        wq, wk, wv = w[:, :d], w[:, d : 2 * d], w[:, 2 * d :]
        bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
        rep[key] = {"ln_1": val["ln_1"], "ln_2": val["ln_2"],
                    "out_bias": _np(attn["out_proj"]["bias"]),
                    "proj_bias": _np(mlp["c_proj"]["bias"])}
        shard[key] = {
            "wq": _chunk(wq, tp, 1), "wk": _chunk(wk, tp, 1),
            "wv": _chunk(wv, tp, 1),
            "bq": _chunk(bq, tp, 0), "bk": _chunk(bk, tp, 0),
            "bv": _chunk(bv, tp, 0),
            "wo": _chunk(attn["out_proj"]["kernel"], tp, 0),  # [d, d] rows
            "wfc": _chunk(mlp["c_fc"]["kernel"], tp, 1),  # [d, 4d] cols
            "bfc": _chunk(mlp["c_fc"]["bias"], tp, 0),
            "wproj": _chunk(mlp["c_proj"]["kernel"], tp, 0),  # [4d, d] rows
        }
    return {"rep": rep, "shard": shard}


def split_text_params_tp(params: Dict, tp: int) -> Dict:
    """Split flax :class:`~imp_tpu.models.clip.TextTransformer` params the
    same way (the text tower shares the residual-block structure; only the
    embedding/pooling ends differ)."""
    return split_vision_params_tp(params, tp)


def _layer_norm(x, ln, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block_tp(x, rep, shard, heads_local: int, axis_name: str,
              causal: bool = False):
    """One pre-LN residual transformer block with this device's head/column
    shard; two psums reassemble the residual branches."""
    b, n, d = x.shape

    # ---- attention (local heads, exact softmax) -------------------------
    y = _layer_norm(x, rep["ln_1"])
    q = y @ shard["wq"] + shard["bq"]  # [b, n, d/tp]
    k = y @ shard["wk"] + shard["bk"]
    v = y @ shard["wv"] + shard["bv"]
    dh = q.shape[-1] // heads_local

    def split_heads(t):
        return t.reshape(b, n, heads_local, dh).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scores = jnp.einsum("bhld,bhsd->bhls", q * (dh**-0.5), k)
    if causal:
        cm = jnp.tril(jnp.ones((n, n), dtype=bool))
        scores = jnp.where(cm[None, None], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
    out = lax.psum(out @ shard["wo"], axis_name)  # row-parallel out proj
    x = x + out + rep["out_bias"]

    # ---- MLP (column/row-parallel) ---------------------------------------
    z = _layer_norm(x, rep["ln_2"])
    h = _quick_gelu(z @ shard["wfc"] + shard["bfc"])  # [b, n, 4d/tp]
    o = lax.psum(h @ shard["wproj"], axis_name)
    return x + o + rep["proj_bias"]


def _vit_forward_tp(vit, rep, shard, x, axis_name: str):
    """Per-device ViT forward (mirrors
    :meth:`imp_tpu.models.clip.VisionTransformer.__call__`, ref
    ``clip/model.py:219-236``) with block weights sharded over
    ``axis_name``."""
    tp = lax.axis_size(axis_name)
    assert vit.heads % tp == 0, (
        f"{vit.heads} attention heads not divisible by model-axis size {tp}"
    )
    heads_local = vit.heads // tp
    b = x.shape[0]
    grid = vit.input_resolution // vit.patch_size
    x = lax.conv_general_dilated(
        x, rep["conv1_kernel"],
        window_strides=(vit.patch_size, vit.patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, grid * grid, vit.width)
    cls = jnp.tile(rep["class_embedding"][None, None, :], (b, 1, 1))
    x = jnp.concatenate([cls, x], axis=1) + rep["positional_embedding"][None]
    x = _layer_norm(x, rep["ln_pre"])
    for i in range(vit.layers):
        key = f"resblocks_{i}"
        # shard leaves arrive with a local leading [1] shard axis
        local = jax.tree_util.tree_map(lambda t: t[0], shard[key])
        x = _block_tp(x, rep[key], local, heads_local, axis_name)
    x = _layer_norm(x[:, 0, :], rep["ln_post"])
    return x @ rep["proj"]


def _text_forward_tp(txt, rep, shard, tokens, axis_name: str):
    """Per-device text-tower forward (mirrors
    :meth:`imp_tpu.models.clip.TextTransformer.__call__`, ref
    ``clip/model.py:343-355``) with causal blocks sharded over
    ``axis_name``."""
    tp = lax.axis_size(axis_name)
    assert txt.heads % tp == 0, (
        f"{txt.heads} attention heads not divisible by model-axis size {tp}"
    )
    heads_local = txt.heads // tp
    x = rep["token_embedding"][tokens] + rep["positional_embedding"][
        None, : tokens.shape[1]
    ]
    for i in range(txt.layers):
        key = f"resblocks_{i}"
        local = jax.tree_util.tree_map(lambda t: t[0], shard[key])
        x = _block_tp(x, rep[key], local, heads_local, axis_name, causal=True)
    x = _layer_norm(x, rep["ln_final"])
    eot = tokens.argmax(axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ rep["text_projection"]


def make_tp_encode_text(txt, mesh: Mesh, data_axis: str = "data",
                        model_axis: str = "model"):
    """jitted ``fn(tp_params, tokens) -> embeddings`` — the text-tower
    counterpart of :func:`make_tp_encode` (PLIP prompt encoding for
    prototype extraction, CLIPOMIC's frozen tower)."""

    def body(rep, shard, tokens):
        return _text_forward_tp(txt, rep, shard, tokens, model_axis)

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def fn(tp_params, tokens):
        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs_like(tp_params["rep"], P()),
                      specs_like(tp_params["shard"], P(model_axis)),
                      P(data_axis)),
            out_specs=P(data_axis),
        )
        return sharded(tp_params["rep"], tp_params["shard"], tokens)

    return jax.jit(fn)


def make_tp_encode(vit, mesh: Mesh, data_axis: str = "data",
                   model_axis: str = "model", pre=None):
    """jitted ``fn(tp_params, images) -> features`` with the batch sharded
    over ``data_axis`` and the transformer blocks sharded over
    ``model_axis``.

    ``tp_params`` comes from :func:`split_vision_params_tp` with
    ``tp == mesh.shape[model_axis]``; place it once with
    :func:`put_tp_params` so weights upload a single time.  ``pre`` is an
    optional elementwise image preprocess (e.g. the uint8 device-normalize
    of ``tools/clip_feature.py``) fused into the sharded call.
    """

    def body(rep, shard, x):
        if pre is not None:
            x = pre(x)
        return _vit_forward_tp(vit, rep, shard, x, model_axis)

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def fn(tp_params, images):
        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs_like(tp_params["rep"], P()),
                      specs_like(tp_params["shard"], P(model_axis)),
                      P(data_axis)),
            out_specs=P(data_axis),
        )
        return sharded(tp_params["rep"], tp_params["shard"], images)

    return jax.jit(fn)


def put_tp_params(tp_params: Dict, mesh: Mesh, model_axis: str = "model"):
    """Device-place a :func:`split_vision_params_tp` tree: replicated leaves
    everywhere, shard leaves with the leading [tp] axis over the model
    axis."""
    rep_s = NamedSharding(mesh, P())
    shard_s = NamedSharding(mesh, P(model_axis))
    return {
        "rep": jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep_s), tp_params["rep"]
        ),
        "shard": jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), shard_s),
            tp_params["shard"],
        ),
    }
