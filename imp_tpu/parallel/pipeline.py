"""Pipeline (stage) parallelism for the CLIP/PLIP vision tower.

A NEW capability beyond reference parity, completing the parallelism matrix
next to data (``parallel/mesh.py``), sequence (``parallel/sequence.py``) and
tensor (``parallel/tensor.py``) axes: the ViT's residual blocks are split
into ``pp`` contiguous stages over a ``pipe`` mesh axis and microbatches
flow through the stages GPipe-style — one ``ppermute`` hop per tick inside
a ``lax.scan``, so activations move stage-to-stage over ICI while every
stage works on a different microbatch.

Where tensor parallelism shards WITHIN a layer (2 psums per block), the
pipe axis shards ACROSS layers: per-device weight memory drops by ``1/pp``
with only point-to-point communication — the right axis when blocks are
many and ICI all-reduce bandwidth is the constraint (deep towers:
ViT-L/14's 24 blocks, RN50x64). Token-cheap stage boundaries (patchify /
embeddings / final LN+projection) are computed replicated on every device
(<2% of tower FLOPs) to keep the schedule uniform.

Expert parallelism is intentionally absent framework-wide: the reference
has no MoE component anywhere (SURVEY §2).

Parity vs the single-device flax tower is tested in
``tests/test_pipeline_parallel.py`` and exercised by ``dryrun_multichip``
phase 4. Like the tp path this is an inference-encode capability for the
offline extraction pipeline (ref ``tools/clip_feature.py:47-54``), where
the towers are frozen feature extractors.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tensor import _layer_norm, _quick_gelu


def _pvary(x, axis_name):
    """Mark ``x`` as device-varying over ``axis_name`` (API moved across
    jax versions: pcast is the current name, pvary the deprecated one)."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axis_name, to="varying")
    return lax.pvary(x, (axis_name,))


def split_vision_params_pp(params: Dict, pp: int) -> Dict:
    """Split flax VisionTransformer params into ``pp`` pipeline stages.

    Returns ``{"rep": <non-block leaves, replicated>, "stages": <block
    leaves stacked [pp, layers_per_stage, ...]>}``. Requires the layer
    count to divide evenly.
    """
    p = params["params"] if "params" in params else params
    rep = {k: v for k, v in p.items() if not k.startswith("resblocks_")}
    n_layers = sum(1 for k in p if k.startswith("resblocks_"))
    assert n_layers % pp == 0, (
        f"{n_layers} blocks not divisible into {pp} pipeline stages"
    )
    lps = n_layers // pp
    blocks = [p[f"resblocks_{i}"] for i in range(n_layers)]
    # stack: leaf -> [pp, lps, ...]
    stages = jax.tree_util.tree_map(
        lambda *leaves: np.stack(
            [np.stack(leaves[s * lps : (s + 1) * lps]) for s in range(pp)]
        ),
        *blocks,
    )
    return {"rep": rep, "stages": stages}


def _block_dense(x, blk, heads: int):
    """One standard pre-LN residual block from a raw flax param subtree
    (the single-device math of ``models/clip.py:ResidualAttentionBlock``)."""
    b, n, d = x.shape
    dh = d // heads
    y = _layer_norm(x, blk["ln_1"])
    qkv = y @ blk["attn"]["in_proj_weight"] + blk["attn"]["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def sh(t):
        return t.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = sh(q), sh(k), sh(v)
    s = jnp.einsum("bhld,bhsd->bhls", q * (dh**-0.5), k)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhls,bhsd->bhld", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + o @ blk["attn"]["out_proj"]["kernel"] + blk["attn"]["out_proj"]["bias"]
    z = _layer_norm(x, blk["ln_2"])
    h = _quick_gelu(z @ blk["mlp"]["c_fc"]["kernel"] + blk["mlp"]["c_fc"]["bias"])
    return x + h @ blk["mlp"]["c_proj"]["kernel"] + blk["mlp"]["c_proj"]["bias"]


def _embed(vit, rep, x):
    b = x.shape[0]
    grid = vit.input_resolution // vit.patch_size
    x = lax.conv_general_dilated(
        x, rep["conv1_kernel"],
        window_strides=(vit.patch_size, vit.patch_size),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, grid * grid, vit.width)
    cls = jnp.tile(rep["class_embedding"][None, None, :], (b, 1, 1))
    x = jnp.concatenate([cls, x], axis=1) + rep["positional_embedding"][None]
    return _layer_norm(x, rep["ln_pre"])


def _vit_forward_pp(vit, rep, stages, x, num_microbatches: int,
                    axis_name: str):
    """GPipe schedule: T = MB + pp - 1 ticks; at tick t, stage s runs
    microbatch ``t - s`` through its block slice, then every activation
    hops one stage over ICI (``ppermute``)."""
    pp = lax.axis_size(axis_name)
    stage = lax.axis_index(axis_name)
    mb = num_microbatches
    b = x.shape[0]
    assert b % mb == 0, f"batch {b} not divisible into {mb} microbatches"

    # replicated stage boundary (<2% of tower FLOPs)
    tokens = _embed(vit, rep, x)
    n, d = tokens.shape[1], tokens.shape[2]
    tokens_mb = tokens.reshape(mb, b // mb, n, d)

    local = jax.tree_util.tree_map(lambda t: t[0], stages)  # [lps, ...]
    lps = jax.tree_util.tree_leaves(local)[0].shape[0]

    def run_stage(h):
        for i in range(lps):
            h = _block_dense(
                h, jax.tree_util.tree_map(lambda t: t[i], local), vit.heads
            )
        return h

    ticks = mb + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    # the scan carry becomes pipe-varying inside the loop (axis_index
    # selects, stage weights differ per device) — the initial carry must
    # already carry that varying axis or scan rejects the carry types
    out0 = _pvary(jnp.zeros_like(tokens_mb), axis_name)
    buf0 = _pvary(jnp.zeros_like(tokens_mb[0]), axis_name)

    def tick(carry, t):
        buf, outs = carry
        # stage 0 injects microbatch t (clamped; stale ticks overwrite
        # nothing downstream because their outputs never collect)
        inject = lax.dynamic_index_in_dim(
            tokens_mb, jnp.clip(t, 0, mb - 1), 0, keepdims=False
        )
        buf = jnp.where(stage == 0, inject, buf)
        y = run_stage(buf)
        # last stage collects microbatch t - (pp - 1) when valid
        m_out = t - (pp - 1)
        mc = jnp.clip(m_out, 0, mb - 1)
        prev = lax.dynamic_index_in_dim(outs, mc, 0, keepdims=False)
        keep = jnp.where((stage == pp - 1) & (m_out >= 0), y, prev)
        outs = lax.dynamic_update_index_in_dim(outs, keep, mc, 0)
        # hop to the next stage
        buf = lax.ppermute(y, axis_name, perm)
        return (buf, outs), None

    (_, outs), _ = lax.scan(tick, (buf0, out0), jnp.arange(ticks))
    # broadcast the last stage's collected outputs to every stage
    outs = lax.psum(
        jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), axis_name
    )
    x = outs.reshape(b, n, d)
    x = _layer_norm(x[:, 0, :], rep["ln_post"])
    return x @ rep["proj"]


def make_pp_encode(vit, mesh: Mesh, num_microbatches: int,
                   data_axis: str = "data", pipe_axis: str = "pipe",
                   pre=None):
    """jitted ``fn(pp_params, images) -> features`` with the batch sharded
    over ``data_axis`` and the ViT blocks staged over ``pipe_axis``.
    ``pre`` is an optional elementwise image preprocess fused into the
    sharded call (see :func:`imp_tpu.parallel.tensor.make_tp_encode`)."""

    def body(rep, stages, x):
        if pre is not None:
            x = pre(x)
        return _vit_forward_pp(vit, rep, stages, x, num_microbatches,
                               pipe_axis)

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def fn(pp_params, images):
        sharded = jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs_like(pp_params["rep"], P()),
                      specs_like(pp_params["stages"], P(pipe_axis)),
                      P(data_axis)),
            out_specs=P(data_axis),
        )
        return sharded(pp_params["rep"], pp_params["stages"], images)

    return jax.jit(fn)


def put_pp_params(pp_params: Dict, mesh: Mesh, pipe_axis: str = "pipe"):
    """Device-place a :func:`split_vision_params_pp` tree: replicated leaves
    everywhere, stage leaves with the leading [pp] axis over the pipe
    axis."""
    rep_s = NamedSharding(mesh, P())
    stage_s = NamedSharding(mesh, P(pipe_axis))
    return {
        "rep": jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep_s), pp_params["rep"]
        ),
        "stages": jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), stage_s),
            pp_params["stages"],
        ),
    }
