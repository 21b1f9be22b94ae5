"""Trainer engine.

TPU-native replacement for the reference's Dassl trainer hierarchy
(``medmm/engine/trainer.py``): a single donated-buffer ``jax.jit`` train
step over a data-parallel Mesh instead of per-batch ``loss.backward()`` +
``nn.DataParallel``; checkpointing with the same best/last semantics;
the same epoch loop / val-selection / logging protocol (including the
``* metric: X%`` log lines ``tools/parse_test_res.py`` scrapes).
"""

from __future__ import annotations

import datetime
import os.path as osp
import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import CfgNode
from ..data import DataManager
from ..evaluation import build_evaluator
from ..losses import build_loss, hazards_to_survival
from ..optim import build_optimizer, lr_at_epoch
from ..parallel import fetch_global, make_mesh, replicate_tree, shard_batch
from ..utils import AverageMeter, MetricMeter, MetricWriter, mkdir_if_missing
from ..utils.checkpoint import (
    best_checkpoint_path,
    load_checkpoint,
    resume_from_checkpoint,
    save_checkpoint,
)

ARRAY_KEYS = (
    "img",
    "img_mask",
    "mol",
    "label",
    "survival_month",
    "censorship",
    "without_omic",
    "insample_without_omic",
    "omic_means",
)


#: batch fields that are NOT per-sample (replicated instead of dim-0 sharded)
REPLICATED_KEYS = ("omic_means",)


def pad_ragged_dim0(arrays: Dict, n_shards: int) -> Dict:
    """Wrap-pad every leaf's dim 0 to a multiple of ``n_shards``.

    Pad rows repeat real samples (``idx % B``), so every batch genuinely
    shards over the data axis.  When the padded size is an exact multiple of
    the true batch (e.g. batch 2 or 4 on an 8-device mesh) each sample is
    duplicated uniformly and batch-mean losses/gradients are *identical* to
    the unpadded step; for uneven wraps (e.g. a ragged last batch of 3) the
    last batch's per-sample weighting differs slightly from a ragged
    single-device step — documented in PARITY.md.  Eval paths drop the pad
    rows after readback, so metrics are exact.
    """
    if not arrays:
        return arrays
    b = int(np.asarray(next(iter(arrays.values()))).shape[0])
    pad = (-b) % n_shards
    if pad == 0:
        return arrays
    idx = np.arange(b + pad) % b
    return {k: np.asarray(v)[idx] for k, v in arrays.items()}


SEQ_SHARDED_KEYS = ("img", "img_mask")  # token axis shardable over "seq"


def validated_sp_mode(cfg) -> str:
    """``cfg.TPU.SP_ATTENTION`` with its value validated at the consumption
    site: a typo like ``'rign'`` would otherwise silently fall through every
    ``== "ring"`` check and run the gather layout, defeating the
    memory-saving intent with no signal."""
    mode = cfg.TPU.SP_ATTENTION
    if mode not in ("gather", "ring"):
        raise ValueError(
            f"TPU.SP_ATTENTION must be 'gather' or 'ring', got {mode!r}"
        )
    return mode


def sp_batch_specs(batch):
    """Per-key PartitionSpecs for a shard_map'ed train body on a dp x sp mesh:
    SEQ_SHARDED_KEYS shard (batch, token) over ("data", "seq"); REPLICATED_KEYS
    and scalars replicate; everything else shards dim 0 over "data"."""
    from jax.sharding import PartitionSpec as P

    return {
        k: (
            P("data", "seq")
            if k in SEQ_SHARDED_KEYS
            else P()
            if k in REPLICATED_KEYS or jnp.ndim(v) == 0
            else P("data")
        )
        for k, v in batch.items()
    }


def device_batch(batch: Dict, mesh) -> Dict:
    """Ship array fields to the mesh (dim 0 sharded over 'data', wrap-padded
    to the data-axis size; REPLICATED_KEYS replicated; on a mesh with a
    'seq' axis the bag token dim of SEQ_SHARDED_KEYS is sharded over it);
    keep host fields (patient_id, index) on host."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    arrays = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
    repl = {k: arrays.pop(k) for k in REPLICATED_KEYS if k in arrays}
    n_shards = int(mesh.shape.get("data", 1))
    if n_shards > 1:
        arrays = pad_ragged_dim0(arrays, n_shards)
    n_seq = int(mesh.shape.get("seq", 1))
    seq_arrays = {}
    if n_seq > 1:
        seq_arrays = {k: arrays.pop(k) for k in SEQ_SHARDED_KEYS if k in arrays}
    out = shard_batch(arrays, mesh)
    for k, v in seq_arrays.items():
        v = np.asarray(v)
        assert v.shape[1] % n_seq == 0, (
            f"{k} token dim {v.shape[1]} not divisible by seq-axis size "
            f"{n_seq} — pick DATASET.BAG_PAD as a multiple of it"
        )
        spec = P("data", "seq", *([None] * (v.ndim - 2)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    if repl:
        out.update(replicate_tree(repl, mesh))
    return out


class DeviceBagCache:
    """Device-resident cache of per-slide bags.

    The bag (``img`` + ``img_mask``) dominates batch bytes (e.g. 20 MB per
    10k x 512 slide); re-uploading it every epoch is waste — severe under
    remote-TPU links.  Each slide is uploaded once and batches are stacked
    on device afterwards.  Disabled automatically beyond ``budget_bytes``
    or on multi-device meshes (where per-shard placement wins).
    """

    def __init__(self, mesh, budget_bytes: float = 8e9):
        self.enabled = int(np.prod(list(mesh.shape.values()))) == 1
        self.budget = budget_bytes
        self.used = 0
        self._cache: Dict = {}

    def build(self, batch: Dict, mesh, tag: str = "") -> Dict:
        if not self.enabled or "index" not in batch:
            return device_batch(batch, mesh)
        small = {
            k: v for k, v in batch.items()
            if k in ARRAY_KEYS and k not in ("img", "img_mask")
        }
        out = shard_batch(small, mesh)
        for field in ("img", "img_mask"):
            if field not in batch:
                continue
            parts = []
            for i, idx in enumerate(np.asarray(batch["index"])):
                key = (tag, field, int(idx))
                if key not in self._cache:
                    nbytes = batch[field][i].nbytes
                    if self.used + nbytes > self.budget:
                        # budget exhausted: transfer without caching
                        parts.append(jax.device_put(batch[field][i]))
                        continue
                    self._cache[key] = jax.device_put(batch[field][i])
                    self.used += nbytes
                parts.append(self._cache[key])
            out[field] = jnp.stack(parts)
        return out


def compute_dtype_of(cfg):
    """Mixed-precision policy: TRAINER.PREC in (bf16, fp16, amp) computes the
    forward/backward in bfloat16 (params stay fp32 in the optimizer; losses
    and the pinv iteration stay fp32). The reference's amp/fp16 map to bf16
    on TPU (no loss scaling needed) — ref ``mbtrain.py:97,119-136``."""
    return jnp.bfloat16 if cfg.TRAINER.PREC in ("bf16", "fp16", "amp") else None


def cast_floats(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def make_task_loss(cfg) -> Callable:
    """Loss glue: TASK.NAME + TASK.LOSS -> callable(logits, batch) -> loss.

    Mirrors the per-engine dispatch (ref ``mbtrain.py:167-189``,
    ``mcat.py:165-172``).
    """
    task = cfg.TASK.NAME
    name = cfg.TASK.LOSS
    alpha = float(cfg.LOSS.ALPHA)
    reduction = cfg.LOSS.REDUCTION
    if task != "Survival":
        loss_obj = build_loss("celoss")
        return lambda logits, batch: loss_obj(logits, batch["label"])
    if name == "nllsurvloss_new":
        loss_obj = build_loss(name, alpha=alpha, reduction=reduction)
        return lambda logits, batch: loss_obj(
            logits, batch["label"], batch["censorship"]
        )
    if name in ("nllsurvloss", "cesurvloss"):
        loss_obj = build_loss(name)

        def fn(logits, batch):
            hazards = jax.nn.sigmoid(logits)
            S = hazards_to_survival(hazards)
            return loss_obj(hazards, S, batch["label"], batch["censorship"])

        return fn
    if name == "coxsurvloss":
        loss_obj = build_loss(name)
        return lambda logits, batch: loss_obj(
            logits[:, :1], batch["survival_month"], batch["censorship"]
        )
    raise ValueError(f"Unknown TASK.LOSS: {name}")


class TrainerBase:
    """Shared scaffolding: data, evaluator, mesh, logging, checkpoints."""

    def __init__(self, cfg: CfgNode):
        self.cfg = cfg
        self.check_cfg(cfg)
        if cfg.TPU.DEBUG_NANS:
            jax.config.update("jax_debug_nans", True)
        # persistent compilation cache: first compiles of the step variants
        # are expensive; subsequent runs (5-fold sweeps!) reuse them
        try:
            import os

            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/imp_tpu_jax_cache"
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass

        if cfg.TPU.ATTENTION in ("nystrom", "flash"):
            from ..ops.attention import set_default_attention_impl

            set_default_attention_impl(cfg.TPU.ATTENTION)

        self.start_epoch = self.epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.output_dir = cfg.OUTPUT_DIR
        mkdir_if_missing(self.output_dir)

        self.mesh = make_mesh(cfg.TPU.MESH_AXES, cfg.TPU.MESH_SHAPE)
        self.dm = DataManager(cfg)
        self.train_loader = self.dm.train_loader
        self.val_loader = self.dm.val_loader
        self.test_loader = self.dm.test_loader
        self.num_classes = self.dm.num_classes
        self.lab2cname = self.dm.lab2cname
        if cfg.VERBOSE:
            self.dm.show_summary()

        # survival baseline for IPCW (ref trainer.py:383-399)
        if cfg.TASK.NAME == "Survival":
            tr_t, tr_c = self.dm.train_set.get_event_and_censorship()
            if self.dm.val_set is not None:
                va_t, va_c = self.dm.val_set.get_event_and_censorship()
            else:
                va_t, va_c = np.empty(0), np.empty(0)
            all_c = np.concatenate([tr_c, va_c], axis=0)
            all_t = np.concatenate([tr_t, va_t], axis=0)
            self.all_survival = ((1 - all_c).astype(bool), all_t)
            self.evaluator = build_evaluator(
                cfg, all_survival=self.all_survival, bins=None
            )
        else:
            self.all_survival = None
            self.evaluator = build_evaluator(cfg, lab2cname=self.lab2cname)

        self.rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        self.best_result = -np.inf
        self.writer: Optional[MetricWriter] = None
        self.time_start = None

        self.task_loss = make_task_loss(cfg)
        self.bag_cache = DeviceBagCache(self.mesh) if cfg.DATALOADER.DEVICE_CACHE else None
        self.build_model()

    # -- to be provided by subclasses ---------------------------------------
    def check_cfg(self, cfg):
        pass

    def build_model(self):
        raise NotImplementedError

    def train_step(self, batch: Dict) -> Dict:
        raise NotImplementedError

    def eval_logits(self, batch: Dict, split: str, batch_index: int) -> np.ndarray:
        raise NotImplementedError

    # -- state management -----------------------------------------------------
    def state_dict(self) -> Dict:
        raise NotImplementedError

    def load_state_dict(self, state: Dict) -> None:
        raise NotImplementedError

    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -- generic loops ---------------------------------------------------------
    def train(self, *args, **kwargs):
        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
        return self.after_train()

    def before_train(self):
        directory = self.cfg.RESUME or self.output_dir
        state, epoch = resume_from_checkpoint(
            osp.join(directory, "model"), self.state_dict()
        )
        if epoch > 0:
            self.load_state_dict(state)
            self.start_epoch = epoch
        self.writer = MetricWriter(osp.join(self.output_dir, "tensorboard"))
        self.time_start = time.time()
        if self.cfg.TPU.PROFILE_DIR:
            jax.profiler.start_trace(self.cfg.TPU.PROFILE_DIR)

    def before_epoch(self):
        self.train_loader.set_epoch(self.epoch)

    def run_epoch(self):
        """Training epoch with DEFERRED metric readbacks: per-step metrics
        stay on device (this environment's remote-TPU tunnel makes every
        host readback a full round-trip) and are materialized in one
        device_get at print points / epoch end."""
        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        num_batches = len(self.train_loader)
        n_slides = 0
        pending = []  # (batch_idx, device-metrics dict)

        def flush():
            if not pending:
                return
            host = fetch_global([m for _, m in pending])
            for (bi, _), metrics in zip(pending, host):
                metrics = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(metrics.get("loss", 0.0)):
                    raise FloatingPointError("Loss is infinite or NaN!")
                losses.update(metrics)
                n_iter = self.epoch * num_batches + bi
                for name, value in metrics.items():
                    self.writer.write_scalar("train/" + name, value, n_iter)
            pending.clear()

        end = time.time()
        for batch_idx, batch in enumerate(self.train_loader):
            data_time.update(time.time() - end)
            summary = self.train_step(batch)  # device scalars
            batch_time.update(time.time() - end)
            pending.append((batch_idx, summary))
            n_slides += len(batch["patient_id"])

            meet_freq = (batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0
            if meet_freq or num_batches < self.cfg.TRAIN.PRINT_FREQ:
                flush()
                nb_remain = (num_batches - batch_idx - 1) + (
                    self.max_epoch - self.epoch - 1
                ) * num_batches
                eta = str(datetime.timedelta(seconds=int(batch_time.avg * nb_remain)))
                info = [
                    f"epoch [{self.epoch + 1}/{self.max_epoch}]",
                    f"batch [{batch_idx + 1}/{num_batches}]",
                    f"time {batch_time.val:.3f} ({batch_time.avg:.3f})",
                    f"data {data_time.val:.3f} ({data_time.avg:.3f})",
                    f"{losses}",
                    f"lr {self.get_current_lr():.4e}",
                    f"eta {eta}",
                ]
                print(" ".join(info))
            end = time.time()
        flush()
        dt = max(batch_time.sum, 1e-9)
        self.writer.write_scalar("train/slides_per_sec", n_slides / dt, self.epoch)

    def after_epoch(self):
        last_epoch = (self.epoch + 1) == self.max_epoch
        do_test = not self.cfg.TEST.NO_TEST
        meet_freq = (
            (self.epoch + 1) % self.cfg.TRAIN.CHECKPOINT_FREQ == 0
            if self.cfg.TRAIN.CHECKPOINT_FREQ > 0
            else False
        )
        if do_test:
            curr = self.test(split="val")
            if self.cfg.TEST.FINAL_MODEL == "best_val" and curr > self.best_result:
                self.best_result = curr
                save_checkpoint(
                    self.state_dict(),
                    osp.join(self.output_dir, "model"),
                    self.epoch + 1,
                    is_best=True,
                    model_name="model-best.ckpt",
                    backend=self.cfg.TPU.CHECKPOINT_BACKEND,
                )
        if meet_freq or last_epoch:
            save_checkpoint(
                self.state_dict(), osp.join(self.output_dir, "model"),
                self.epoch + 1, backend=self.cfg.TPU.CHECKPOINT_BACKEND,
            )

    def after_train(self):
        print("Finish training")
        result = None
        if not self.cfg.TEST.NO_TEST:
            if self.cfg.TEST.FINAL_MODEL == "best_val":
                print("Deploy the model with the best val performance")
                best = best_checkpoint_path(osp.join(self.output_dir, "model"))
                if best:
                    self.load_state_dict(load_checkpoint(best, self.state_dict()))
            else:
                print("Deploy the last-epoch model")
            result = self.test()
        if self.cfg.TPU.PROFILE_DIR:
            jax.profiler.stop_trace()
        elapsed = round(time.time() - self.time_start)
        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")
        if self.writer:
            self.writer.close()
        return result

    def test(self, split: Optional[str] = None, **kwargs) -> float:
        self.evaluator.reset()
        if split is None:
            split = self.cfg.TEST.SPLIT
        if split == "val" and self.val_loader is not None:
            loader = self.val_loader
        else:
            split = "test"
            loader = self.test_loader
        print(f"Evaluate on the *{split}* set")
        pending = []  # defer device->host readbacks to one device_get
        for batch_index, batch in enumerate(loader):
            logits = self.eval_logits(batch, split, batch_index)
            pending.append((logits, batch))
        for logits, batch in zip(
            fetch_global([l for l, _ in pending]), [b for _, b in pending]
        ):
            # drop wrap-pad rows added by device_batch for ragged batches
            self.process_eval_batch(
                np.asarray(logits)[: len(batch["patient_id"])], batch
            )
        results = self.evaluator.evaluate()
        for k, v in results.items():
            if self.writer:
                self.writer.write_scalar(f"{split}/{k}", v, self.epoch)
        return list(results.values())[0]

    def process_eval_batch(self, logits: np.ndarray, batch: Dict) -> None:
        if self.cfg.TASK.NAME == "Survival":
            ev = type(self.evaluator).__name__
            if ev == "Survival_UMEML":
                self.evaluator.process(
                    batch["patient_id"], logits, batch["censorship"],
                    batch["survival_month"],
                )
            else:
                hazards = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
                S = np.cumprod(1.0 - hazards, axis=1)
                self.evaluator.process(S, batch["censorship"], batch["survival_month"])
        else:
            self.evaluator.process(logits, batch["label"])

    def get_current_lr(self) -> float:
        return lr_at_epoch(self.cfg.OPTIM, self.epoch)

    def load_model(self, directory: Optional[str] = None, epoch: Optional[int] = None):
        """Load for eval (reference ``trainer.py:210-239``)."""
        directory = directory or self.output_dir
        mdir = osp.join(directory, "model")
        if epoch is not None:
            path = osp.join(mdir, f"model.ckpt-{epoch}")
        else:
            path = best_checkpoint_path(mdir)
            if path is None:
                pointer = osp.join(mdir, "checkpoint")
                with open(pointer) as f:
                    path = osp.join(mdir, f.read().strip())
        self.load_state_dict(load_checkpoint(path, self.state_dict()))
        print(f"Loaded model weights from {path}")


class StandardTrainer(TrainerBase):
    """Generic single-optimizer trainer for nets with signature
    ``apply(params, batch, train) -> logits`` — covers the MIL / genomic /
    fusion baseline engines (ref ``engine/{abmil,transmil,snn,snnm,mcat,...}``).
    """

    #: subclasses set this: callable(cfg, dm, num_classes) -> nn.Module
    def build_network(self):
        raise NotImplementedError

    def network_seq_axis(self):
        """Mesh axis name for sequence parallelism, or None.  Subclasses
        whose net supports a token-sharded bag (TransMIL) return "seq" when
        the mesh has one; the jitted steps then run under shard_map with
        img/img_mask sharded (data, seq)."""
        return None

    def extra_loss(self, out, batch):
        """Hook for auxiliary losses (e.g. CMTA's alignment terms)."""
        return 0.0

    def init_network_params(self, params):
        """Hook: transform freshly-initialized params (e.g. graft pretrained
        weights).  Runs after MODEL.INIT_WEIGHTS loading."""
        return params

    def param_labels(self, params):
        """Hook: optax.multi_transform labels ('train' / 'frozen') or None.
        'frozen' params receive zero updates (no decay either) — the
        functional equivalent of torch requires_grad_(False)."""
        return None

    def network_num_classes(self):
        from ..models.nets import survival_num_classes

        return survival_num_classes(self.cfg.TASK.NAME, self.num_classes)

    def build_model(self):
        cfg = self.cfg
        self.sp_axis = self.network_seq_axis()
        self._net_seq_axis = self.sp_axis
        self.model = self.build_network()
        if self.sp_axis:
            # init with a non-sp twin (init must trace no collectives);
            # the param structure is identical by construction
            self._net_seq_axis = None
            init_model = self.build_network()
            self._net_seq_axis = self.sp_axis
        else:
            init_model = self.model
        sample = next(iter(self.test_loader))
        init_batch = {
            k: jnp.asarray(v[:1]) for k, v in sample.items() if k in ARRAY_KEYS
        }
        variables = init_model.init(
            {"params": self.next_rng(), "dropout": self.next_rng()},
            init_batch,
            train=True,
        )
        variables = dict(variables)
        self.model_state = {
            k: v for k, v in variables.items() if k != "params"
        }  # e.g. batch_stats (HFB's BatchNorm)
        params = {"params": variables["params"]}
        if cfg.MODEL.INIT_WEIGHTS:
            from ..utils.checkpoint import load_pretrained_params

            params = load_pretrained_params(cfg.MODEL.INIT_WEIGHTS, params)
        params = self.init_network_params(params)
        from ..utils import count_num_param

        print(f"# params: {count_num_param(params):,}")
        self.params = replicate_tree(params, self.mesh)
        self.model_state = replicate_tree(self.model_state, self.mesh)

        updates_per_epoch = max(
            1, -(-len(self.train_loader) // max(1, cfg.OPTIM.GRAD_ACCUM))
        )
        tx = build_optimizer(cfg.OPTIM, updates_per_epoch)
        labels = self.param_labels(params)
        if labels is not None:
            n_frozen = sum(
                int(np.prod(l.shape))
                for l, lab in zip(
                    jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(labels),
                )
                if lab == "frozen"
            )
            print(f"# frozen params: {n_frozen:,}")
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, labels
            )
        if cfg.OPTIM.GRAD_ACCUM > 1:
            tx = optax.MultiSteps(tx, cfg.OPTIM.GRAD_ACCUM)
        self.tx = tx
        self.opt_state = replicate_tree(tx.init(params), self.mesh)

        model, task_loss, extra_loss = self.model, self.task_loss, self.extra_loss
        mutable_keys = sorted(self.model_state.keys())
        cdtype = compute_dtype_of(cfg)
        # TPU.DONATE frees old param/opt buffers in-place; TPU.REMAT
        # rematerializes the forward during backward (HBM for FLOPs).
        donate = (0, 1, 2) if bool(cfg.TPU.DONATE) else ()
        remat = bool(cfg.TPU.REMAT)

        sp = self.sp_axis
        if sp:
            assert not mutable_keys, (
                "sequence parallelism is not wired for nets with mutable "
                "collections (batch_stats)"
            )

        def _train_body(params, model_state, opt_state, batch, rng):
            if sp:
                # independent dropout per data shard (the rng enters
                # shard_map replicated)
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            cbatch = cast_floats(batch, cdtype)

            def _fwd(pc):
                if mutable_keys:
                    return model.apply(
                        {**pc, **model_state},
                        cbatch,
                        train=True,
                        rngs={"dropout": rng},
                        mutable=mutable_keys,
                    )
                return (
                    model.apply(
                        {**pc, **model_state}, cbatch, train=True, rngs={"dropout": rng}
                    ),
                    model_state,
                )

            fwd = jax.checkpoint(_fwd) if remat else _fwd

            def loss_fn(p):
                pc = cast_floats(p, cdtype)
                out, new_state = fwd(pc)
                logits = out["logits"] if isinstance(out, dict) else out
                logits = logits.astype(jnp.float32)
                out = cast_floats(out, jnp.float32) if cdtype else out
                loss = task_loss(logits, batch)
                loss = loss + extra_loss(out, batch)
                if sp:  # global batch mean -> grads all-reduce over 'data'
                    loss = jax.lax.pmean(loss, "data")
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, dict(new_state), opt_state, loss

        def _eval_body(params, model_state, batch):
            out = model.apply(
                {**cast_floats(params, cdtype), **model_state},
                cast_floats(batch, cdtype),
                train=False,
            )
            logits = out["logits"] if isinstance(out, dict) else out
            return logits.astype(jnp.float32)

        if sp:
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh
            _sp_specs = sp_batch_specs

            @partial(jax.jit, donate_argnums=donate)
            def _train_step(params, model_state, opt_state, batch, rng):
                fn = jax.shard_map(
                    _train_body,
                    mesh=mesh,
                    in_specs=(P(), P(), P(), _sp_specs(batch), P()),
                    out_specs=(P(), P(), P(), P()),
                )
                return fn(params, model_state, opt_state, batch, rng)

            @jax.jit
            def _eval_step(params, model_state, batch):
                fn = jax.shard_map(
                    _eval_body,
                    mesh=mesh,
                    in_specs=(P(), P(), _sp_specs(batch)),
                    out_specs=P("data"),
                )
                return fn(params, model_state, batch)

        else:
            _train_step = partial(jax.jit, donate_argnums=donate)(_train_body)
            _eval_step = jax.jit(_eval_body)

        self._train_step = _train_step
        self._eval_step = _eval_step

    def _to_device(self, batch: Dict, tag: str) -> Dict:
        if self.bag_cache is not None:
            return self.bag_cache.build(
                {k: v for k, v in batch.items() if k in ARRAY_KEYS or k == "index"},
                self.mesh,
                tag,
            )
        return device_batch(batch, self.mesh)

    def train_step(self, batch: Dict) -> Dict:
        db = self._to_device(batch, "train")
        self.params, self.model_state, self.opt_state, loss = self._train_step(
            self.params, self.model_state, self.opt_state, db, self.next_rng()
        )
        return {"loss": loss}  # device scalar; materialized by run_epoch

    def eval_logits(self, batch, split, batch_index):
        db = self._to_device(batch, split)
        return self._eval_step(self.params, self.model_state, db)  # device array

    def state_dict(self):
        return {
            "params": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
            "epoch": self.epoch + 1,
            "val_result": float(self.best_result)
            if np.isfinite(self.best_result)
            else -1.0,
        }

    def load_state_dict(self, state):
        self.params = replicate_tree(state["params"], self.mesh)
        self.model_state = replicate_tree(state.get("model_state", {}), self.mesh)
        self.opt_state = replicate_tree(state["opt_state"], self.mesh)
