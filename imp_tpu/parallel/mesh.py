"""Mesh / topology module — the TPU-native replacement for the reference's
single-process ``nn.DataParallel`` (reference ``medmm/engine/trainer.py:483-486``).

Design (scaling-book recipe): pick a Mesh, annotate shardings with
NamedSharding, let XLA insert the collectives over ICI.  For this framework
the natural layout is pure data parallelism over slides — every model is
small (~10-20M params) while the batch of 10k-token bags is large, so params
are replicated and the batch axis is sharded over the ``data`` mesh axis;
gradient all-reduce rides ICI inside the jitted step.

Multi-host pods: call :func:`maybe_initialize_distributed` before anything
else.  Every process's loader materializes the identical full global batch
(seeded, deterministic); :func:`shard_batch` hands it to
``make_array_from_process_local_data`` with an explicit global shape so each
device slices out its own shard, and :func:`fetch_global` assembles sharded
step outputs back on every host for evaluation.  (``host_local_slice`` is
provided for pipelines that prefer loading only the local slice.)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched on a multi-host pod.

    No-op unless ``JAX_COORDINATOR_ADDRESS`` is set.  On TPU pods (and other
    auto-detectable clusters — SLURM/OpenMPI/K8s) ``jax.distributed
    .initialize()`` discovers process count/id itself; for manual launches
    (e.g. the 2-process CPU cluster in ``tests/test_multiprocess.py``) set
    ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID`` explicitly — jax 0.9 has no
    plain env-var cluster detector."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        if not os.environ.get("JAX_PROCESS_ID"):
            raise ValueError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not — a "
                "manual multi-process launch needs both (one unique "
                "JAX_PROCESS_ID in [0, JAX_NUM_PROCESSES) per process)"
            )
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    elif os.environ.get("JAX_PROCESS_ID"):
        raise ValueError(
            "JAX_PROCESS_ID is set but JAX_NUM_PROCESSES is not — a manual "
            "multi-process launch needs both"
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape`` entries of -1 absorb all remaining devices (like a reshape).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    n = len(devices)
    if -1 in shape:
        assert n % known == 0, f"{n} devices not divisible by {known}"
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    assert total <= n, f"mesh shape {shape} needs {total} devices, have {n}"
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (the slide/batch axis) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch (pytree of np/jnp arrays) with dim-0 sharded.

    Scalars and rank-0 leaves are replicated.
    """
    data_sharding = batch_sharding(mesh, axis)
    repl = replicated(mesh)
    n_shards = mesh.shape[axis]
    multi_host = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        if x.shape[0] % n_shards != 0:
            # no silent replication fallback: a batch that cannot shard is a
            # bug at the call site (engine.trainer.device_batch wrap-pads
            # ragged batches before calling this)
            raise ValueError(
                f"batch dim 0 ({x.shape[0]}) not divisible by data-axis size "
                f"{n_shards}; pad the batch or replicate explicitly"
            )
        if multi_host:
            # every process loads the FULL global batch (the loaders are
            # deterministic and identical across hosts); the explicit
            # global_shape == local shape tells jax the data is the whole
            # target array — each device slices out its own shard.  Without
            # it the inferred global would be pc x bigger (duplicated data).
            return jax.make_array_from_process_local_data(
                data_sharding, x, global_shape=x.shape
            )
        return jax.device_put(x, data_sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate_tree(tree, mesh: Mesh):
    repl = replicated(mesh)

    def _put(x):
        # already-placed global arrays pass through: on a multi-process mesh
        # they are not fully addressable and device_put would reject them
        if isinstance(x, jax.Array) and x.sharding == repl:
            return x
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def fetch_global(tree):
    """Host-local numpy copy of (a pytree of) possibly multi-host global
    arrays.

    Single-process: plain ``jax.device_get``.  On a pod, data-sharded step
    outputs (eval logits, importance rows) have shards on OTHER processes'
    devices, so ``device_get`` would fail on non-addressable arrays —
    ``multihost_utils.process_allgather`` assembles the full value on every
    process instead, making evaluation/metric readbacks pod-safe (every
    process computes identical metrics; writers stay primary-only)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: (
            np.asarray(x)
            if not hasattr(x, "sharding") or x.is_fully_addressable
            else multihost_utils.process_allgather(x, tiled=True)
        ),
        tree,
    )


def host_local_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch (multi-host)."""
    pc, pi = jax.process_count(), jax.process_index()
    assert global_batch_size % pc == 0
    per = global_batch_size // pc
    return pi * per, per
