"""Checkpoint IO with the reference's best/last/pointer semantics
(reference ``medmm/utils/torchtools.py:27-157``): per-model directory under
OUTPUT_DIR containing ``model.ckpt-<epoch>`` files, a ``checkpoint`` pointer
text file naming the latest, and ``model-best.ckpt`` when val improves.

Serialization: flax msgpack over the full train-state pytree (params + all
optimizer states + epoch + val_result) by default, or **orbax**
(``TPU.CHECKPOINT_BACKEND=orbax``) — each ``model.ckpt-<epoch>`` becomes an
orbax directory (tensorstore-chunked, collective sharded writes on pods:
every process writes its own array shards instead of the primary
serializing a replicated copy).  The pointer/best/resume contract is
backend-independent, and readers auto-detect the format per checkpoint
(directory = orbax, file = msgpack), so mixed-backend output dirs resume
fine.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Optional, Tuple

from flax import serialization

from .logger import mkdir_if_missing


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    # the synchronous Checkpointer: save returns only after the write is
    # durable (the trainer's pointer-file update must not outrun the data)
    return ocp, ocp.Checkpointer(ocp.StandardCheckpointHandler())


def _orbax_save(path: str, state: Any) -> None:
    ocp, ck = _orbax_checkpointer()
    try:
        ck.save(osp.abspath(path), args=ocp.args.StandardSave(state),
                force=True)
    finally:
        ck.close()


def _orbax_restore(path: str, target: Any = None) -> Any:
    ocp, ck = _orbax_checkpointer()
    try:
        if target is None:
            return ck.restore(osp.abspath(path))
        return ck.restore(
            osp.abspath(path), args=ocp.args.StandardRestore(target)
        )
    finally:
        ck.close()


def save_checkpoint(
    state: Any,
    directory: str,
    epoch: int,
    is_best: bool = False,
    model_name: str = "",
    backend: str = "msgpack",
) -> str:
    mkdir_if_missing(directory)
    if not model_name:
        model_name = f"model.ckpt-{epoch}"
    fpath = osp.join(directory, model_name)
    import jax

    if backend == "orbax":
        # orbax saves are COLLECTIVE: every process participates (each
        # writes its own shards) — no primary-only gating
        _orbax_save(fpath, state)
        if is_best and osp.basename(fpath) != "model-best.ckpt":
            # the collective save above is already durable when it returns;
            # duplicate it as model-best.ckpt with a primary-only filesystem
            # copy (atomic rename) instead of a second full collective write
            if jax.process_index() == 0 or jax.process_count() == 1:
                import os
                import shutil

                best = osp.join(directory, "model-best.ckpt")
                tmp = best + ".tmp"
                if osp.exists(tmp):
                    shutil.rmtree(tmp)
                shutil.copytree(fpath, tmp)
                if osp.exists(best):
                    shutil.rmtree(best)
                os.replace(tmp, best)
        if jax.process_index() == 0 or jax.process_count() == 1:
            with open(osp.join(directory, "checkpoint"), "w") as f:
                f.write(osp.basename(fpath))
            print(f'Checkpoint saved to "{fpath}" (orbax)')
    elif jax.process_index() == 0 or jax.process_count() == 1:
        # msgpack: the train state is replicated, so only the primary
        # process writes (everyone racing on a shared FS corrupts the
        # pointer); all processes then sync so nobody reads a half-written
        # file
        with open(fpath, "wb") as f:
            f.write(serialization.to_bytes(state))
        with open(osp.join(directory, "checkpoint"), "w") as f:
            f.write(osp.basename(fpath))
        if is_best:
            best = osp.join(directory, "model-best.ckpt")
            with open(best, "wb") as f:
                f.write(serialization.to_bytes(state))
        print(f'Checkpoint saved to "{fpath}"')
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("imp_tpu_ckpt_write")
    return fpath


def load_checkpoint(fpath: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree).
    Backend auto-detected: an orbax checkpoint is a directory, a flax
    msgpack checkpoint is a file."""
    if not osp.exists(fpath):
        raise FileNotFoundError(f'File is not found at "{fpath}"')
    if osp.isdir(fpath):
        return _orbax_restore(fpath, target)
    with open(fpath, "rb") as f:
        return serialization.from_bytes(target, f.read())


def resume_from_checkpoint(directory: str, target: Any) -> Tuple[Any, int]:
    """Resume from the ``checkpoint`` pointer file; returns (state, epoch)
    where epoch is 0 when nothing is found (train from scratch)."""
    pointer = osp.join(directory, "checkpoint")
    if not osp.exists(pointer):
        print("No checkpoint found, train from scratch")
        return target, 0
    with open(pointer, "r") as f:
        name = f.read().strip()
    fpath = osp.join(directory, name)
    state = load_checkpoint(fpath, target)
    epoch = int(state["epoch"]) if isinstance(state, dict) and "epoch" in state else 0
    print(f'Loaded checkpoint from "{fpath}" (resume at epoch {epoch})')
    return state, epoch


def best_checkpoint_path(directory: str) -> Optional[str]:
    best = osp.join(directory, "model-best.ckpt")
    return best if osp.exists(best) else None


def load_pretrained_params(fpath: str, params_template):
    """Initialize model params from a saved checkpoint's ``params`` subtree
    (reference ``load_pretrained_weights``, ``torchtools.py:267``: partial,
    non-strict load).  Accepts either a bare state file produced by
    :func:`save_checkpoint` or a directory containing a ``checkpoint``
    pointer."""
    import os.path as _osp

    if _osp.isdir(fpath) and _osp.exists(_osp.join(fpath, "checkpoint")):
        with open(_osp.join(fpath, "checkpoint")) as f:
            fpath = _osp.join(fpath, f.read().strip())
    if _osp.isdir(fpath):  # orbax checkpoint directory
        state = _orbax_restore(fpath)
    else:
        from flax import serialization

        with open(fpath, "rb") as f:
            raw = f.read()
        state = serialization.msgpack_restore(raw)
    # try common layouts: {'state': {...,'params':...}} (MBTRAIN) or
    # {'params': ...} (StandardTrainer)
    node = state
    if "state" in node:
        node = node["state"]
    if "params" in node and "params" in node["params"]:
        loaded = node["params"]  # {'params': tree}
    elif "params" in node:
        loaded = {"params": node["params"]}
    else:
        raise ValueError(f"No params found in checkpoint {fpath}")

    import jax

    def merge(tmpl, got):
        if isinstance(tmpl, dict):
            return {
                k: merge(v, got[k]) if isinstance(got, dict) and k in got else v
                for k, v in tmpl.items()
            }
        if got is not None and tuple(got.shape) == tuple(tmpl.shape):
            import jax.numpy as jnp

            return jnp.asarray(got, tmpl.dtype)
        return tmpl

    merged = merge(params_template, loaded)
    print(f"Initialized weights from {fpath} (non-strict)")
    return merged
