"""Worker process for tests/test_multiprocess.py.

Runs one member of a REAL 2-process ``jax.distributed`` CPU cluster
(4 virtual devices per process, 8 global) and drives the multi-host code
paths that single-process tests can never reach:

* ``maybe_initialize_distributed`` env-var bootstrap (parallel/mesh.py)
* ``shard_batch``'s ``make_array_from_process_local_data`` branch
* ``fetch_global``'s ``process_allgather`` branch (sharded eval outputs)
* orbax COLLECTIVE checkpoint save (both processes in ck.save, phase A) +
  primary-only msgpack write (phase B) + ``sync_global_devices`` barrier
  (utils/checkpoint.py) and the cross-process, cross-format resume read
* primary-only logger/importance-dump gating
* ``host_local_slice`` per-host batch slicing

Reference contract being pod-ified: the generic eval loop
``/root/reference/medmm/engine/trainer.py:550-581`` (single-GPU there).

Usage:  python tests/mp_worker.py <data_root> <out_dir> <result_json>
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set.
"""

import json
import os
import os.path as osp
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
    # don't let a >30 s compile-skew stall abort the process (1-core host;
    # same rationale as tests/conftest.py)
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    + " --xla_cpu_collective_timeout_seconds=1800"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/imp_tpu_jax_cache")

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from imp_tpu.parallel import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()


def _cfg(root: str, out_dir: str, max_epoch: int, backend: str = "msgpack"):
    from imp_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.TPU.CHECKPOINT_BACKEND = backend
    cfg.OUTPUT_DIR = out_dir
    cfg.SEED = 1
    cfg.DATASET.ROOT = root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = 64
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss_new"
    cfg.TEST.EVALUATOR = "Survival_UMEML"
    cfg.TEST.NO_TEST = True
    cfg.DATALOADER.TRAIN.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.OPTIM.MAX_EPOCH = max_epoch
    cfg.MODEL.NAME = "umeml_gan"
    cfg.MODEL.HIDDEN_DIM = 64
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TRAINER.NAME = "MBTRAIN"
    cfg.TPU.PREFETCH = 0
    cfg.TPU.MESH_SHAPE = (-1,)  # all 8 GLOBAL devices
    return cfg


def main(root: str, out_dir: str, result_path: str) -> None:
    from imp_tpu.engine import build_trainer
    from imp_tpu.parallel import host_local_slice

    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    # establish the 8-device Gloo clique NOW, while cross-process skew is
    # still tiny: under heavy host contention the first collective's
    # key-value rendezvous has a 30 s deadline that minutes of skewed
    # compilation can miss (seen in full-suite runs)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_start")

    def barrier(name: str) -> None:
        """Coordination-service (gRPC) barrier — NOT a device collective.

        Each phase below jit-compiles programs with NEW collective patterns,
        and every new Gloo communicator has a hardcoded 30 s key-value
        rendezvous deadline.  Host-level barriers between phases keep the
        two processes' compile starts aligned so their devices reach each
        new rendezvous within seconds of each other even on an
        oversubscribed 1-core host (a real pod has a core per process and
        never sees minutes of compile skew)."""
        try:
            # private API (no public pure-host barrier exists as of jax 0.9)
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(
                name, timeout_in_ms=1_800_000
            )
        except (ImportError, AttributeError):
            # fallback if a jax upgrade moves the client: a device collective
            # also aligns the processes (at the cost of being itself subject
            # to the Gloo rendezvous it is meant to protect)
            multihost_utils.sync_global_devices(name)
    start, size = host_local_slice(8)
    assert (start, size) == (pid * 4, 4), (start, size)

    # ---- phase A: train 1 epoch on the 8-device (2-process) mesh; the
    # epoch-1 checkpoint is an ORBAX COLLECTIVE WRITE — both processes
    # enter ck.save and orbax's internal multihost commit protocol runs
    # for real (VERDICT r4 item 4: this branch had never executed with
    # process_count() > 1)
    trainer = build_trainer(_cfg(root, out_dir, max_epoch=1, backend="orbax"))
    assert int(trainer.mesh.shape["data"]) == 8
    barrier("built")
    trainer.train()
    barrier("trained")
    val = float(trainer.test(split="val"))
    barrier("evaled")

    ckpt_dir = osp.join(out_dir, "model")
    # the barrier in save_checkpoint guarantees visibility on BOTH hosts;
    # an orbax checkpoint is a tensorstore DIRECTORY, not a msgpack file
    assert osp.isdir(osp.join(ckpt_dir, "model.ckpt-1")), os.listdir(ckpt_dir)
    assert osp.exists(osp.join(ckpt_dir, "checkpoint"))
    # primary-only importance dumps: written once, by process 0 only
    imp = osp.join(out_dir, "val_path.txt")
    assert osp.exists(imp)  # shared FS: both processes see the one file

    # ---- phase B: fresh trainer resumes CROSS-FORMAT from the shared
    # orbax checkpoint (readers auto-detect dir=orbax) and continues with
    # the msgpack backend — its epoch-2 save exercises the primary-only
    # replicated-write path in the same run
    trainer2 = build_trainer(
        _cfg(root, out_dir, max_epoch=2, backend="msgpack"))
    barrier("built2")
    trainer2.train()
    assert trainer2.start_epoch == 1, trainer2.start_epoch
    assert osp.isfile(osp.join(ckpt_dir, "model.ckpt-2"))
    barrier("trained2")
    val2 = float(trainer2.test(split="val"))

    with open(result_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "val": val,
                "val2": val2,
                "resumed_start_epoch": trainer2.start_epoch,
            },
            f,
        )
    print(f"worker {pid} OK: val={val:.4f} val2={val2:.4f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
