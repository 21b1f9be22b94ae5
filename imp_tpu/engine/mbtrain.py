"""MBTRAIN — the trainer for UMEML / UMEML_GAN
(reference ``medmm/engine/mbtrain.py`` + the curriculum hardcoded into
``TrainerBase.train``, ref ``engine/trainer.py:280-305``, and the CCA epoch,
ref ``:672-739``).

TPU-native design decisions:

* the reference's three ``backward()+step()`` calls *inside* ``forward()``
  (ref ``umeml_gan.py:461-490``) become gradient computations over the
  generator/discriminator parameter partitions inside ONE jitted,
  donated-buffer train step; sequencing is faithful — the encoder output is
  computed once (same dropout rng reused), the generator is updated first,
  the discriminators see the *updated* generator, and the main loss runs
  with the updated generator params;
* the main optimizer covers all non-discriminator params (reference: main
  Adam over ``model.parameters()``, but torch skips params whose grads are
  None — discriminators never receive main-loss grads).  Coupled L2 decay is
  masked off the generator subtree (torch applies it only on steps where the
  replace path produced generator grads; see builders.build_optimizer);
* the GAN/CCA curriculum is a declarative config (TRAIN.CURRICULUM) instead
  of being baked into the base loop;
* the CCA epoch accumulates ≤64 batches then optimizes
  ``cca_loss + mean(batch_loss)`` with a *fresh* Adam(1e-3) per epoch
  (ref ``trainer.py:682``); the gradient through the accumulated graph is
  computed exactly via a two-pass linearization (values first, then
  per-chunk VJPs with the cca-loss cotangents) instead of holding 64 graphs
  in memory;
* prototype-importance rows stream to ``{split}_{path,omic}.txt`` from the
  host (ref writes them inside forward, ``umeml_gan.py:575-587``).
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import TRAINER_REGISTRY
from .trainer import (
    ARRAY_KEYS,
    TrainerBase,
    cast_floats,
    compute_dtype_of,
    device_batch,
    sp_batch_specs,
    validated_sp_mode,
)
from ..losses import cca_loss as cca_loss_fn
from ..losses import similarity_alignment_loss
from ..models import build_model
from ..models.nets import survival_num_classes
from ..models.umeml_gan import UMEML_GAN
from ..optim import build_optimizer
from ..parallel import fetch_global, replicate_tree
from ..utils import AverageMeter, MetricMeter

GEN_KEYS = ("gan_generator_p2o", "gan_generator_o2p")
DIS_KEYS = ("gan_discriminator_p", "gan_discriminator_o")


def _take(params: Dict, keys) -> Dict:
    return {"params": {k: params["params"][k] for k in keys}}


def _merge(params: Dict, sub: Dict) -> Dict:
    merged = dict(params["params"])
    merged.update(sub["params"])
    return {"params": merged}


def get_omic_delete_mask(batch_size, num_features, ratio, seed=None):
    """Deterministic per-batch omics-deletion mask (ref ``mbtrain.py:270-279``)."""
    rng = np.random.RandomState(seed)
    mask = np.zeros((batch_size, num_features), dtype=np.int32)
    num_selected = int(num_features * max(ratio, 0.0))
    for i in range(batch_size):
        sel = rng.choice(num_features, num_selected, replace=False)
        mask[i, sel] = 1
    return mask


@TRAINER_REGISTRY.register()
class MBTRAIN(TrainerBase):
    """Trainer for the UMEML family."""

    def check_cfg(self, cfg):
        assert cfg.MODEL.NAME in ("umeml", "umeml_gan", "umeml_gan_plot")

    # ------------------------------------------------------------------ #
    # model / optimizers / jitted steps                                   #
    # ------------------------------------------------------------------ #
    def build_model(self):
        cfg = self.cfg
        self.is_gan = cfg.MODEL.NAME in ("umeml_gan", "umeml_gan_plot")
        num_classes = survival_num_classes(cfg.TASK.NAME, self.num_classes)
        # sequence parallelism: opt in by putting a "seq" axis in
        # TPU.MESH_AXES — bag tokens shard over it, the model uses the
        # collective cross-attention/modularity, and the jitted steps run
        # under shard_map. Param structure is identical either way, so the
        # non-sp twin initializes (init traces no collectives).
        self.sp_axis = (
            "seq" if self.is_gan and int(self.mesh.shape.get("seq", 1)) > 1
            else None
        )
        # TPU.SP_ATTENTION=ring keeps per-device memory at O(N/sp): the
        # modularity pair streams column chunks via ppermute instead of
        # all-gathering the bag — the 100k-patch envelope for the flagship
        self.sp_mode = validated_sp_mode(cfg) if self.sp_axis else "gather"
        model_kwargs = dict(
            cfg=cfg,
            num_classes=num_classes,
            gene_group_indexes=self.dm.gene_group_indexes or (),
        )
        self.model = build_model(
            cfg.MODEL.NAME, sp_axis=self.sp_axis, sp_mode=self.sp_mode,
            **model_kwargs
        )
        init_model = (
            build_model(cfg.MODEL.NAME, **model_kwargs)
            if self.sp_axis
            else self.model
        )
        self.omic_means = self.dm.compute_omic_means()

        sample = next(iter(self.test_loader))
        init_batch = self._host_batch(sample, train=True)
        init_batch = {k: jnp.asarray(v[:1]) if hasattr(v, "shape") and np.ndim(v) > 0 and k != "omic_means" else jnp.asarray(v) for k, v in init_batch.items()}
        rngs = {
            "params": self.next_rng(),
            "dropout": self.next_rng(),
            "gan": self.next_rng(),
        }
        if self.is_gan:
            params = init_model.init(rngs, init_batch, method=UMEML_GAN.init_all)
        else:
            params = init_model.init(rngs, init_batch, train=True)
        if cfg.MODEL.INIT_WEIGHTS:
            from ..utils.checkpoint import load_pretrained_params

            params = load_pretrained_params(cfg.MODEL.INIT_WEIGHTS, params)
        params = replicate_tree(params, self.mesh)
        from ..utils import count_num_param

        print(f"# params: {count_num_param(params):,}")

        updates_per_epoch = max(1, len(self.train_loader))
        if self.is_gan:
            main_keys = tuple(
                k for k in params["params"].keys() if k not in DIS_KEYS
            )
            self.main_keys = main_keys

            def decay_mask(sub):
                return {
                    "params": {
                        k: jax.tree_util.tree_map(
                            lambda _: k not in GEN_KEYS, v
                        )
                        for k, v in sub["params"].items()
                    }
                }

            self.main_tx = build_optimizer(
                cfg.OPTIM, updates_per_epoch, decay_mask=decay_mask
            )
            gan_lr = float(cfg.MODEL.UMEML.GAN_LR)
            gan_wd = float(cfg.MODEL.UMEML.GAN_WD)
            gan_tx = optax.chain(
                optax.add_decayed_weights(gan_wd),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale_by_learning_rate(gan_lr),
            )
            self.gen_tx = gan_tx
            self.dis_p_tx = gan_tx
            self.dis_o_tx = gan_tx
            state = {
                "params": params,
                "opt_state": self.main_tx.init(_take(params, main_keys)),
                "gen_opt": gan_tx.init(_take(params, GEN_KEYS)),
                "dis_p_opt": gan_tx.init(_take(params, ("gan_discriminator_p",))),
                "dis_o_opt": gan_tx.init(_take(params, ("gan_discriminator_o",))),
            }
        else:
            self.main_tx = build_optimizer(cfg.OPTIM, updates_per_epoch)
            state = {"params": params, "opt_state": self.main_tx.init(params)}
        # replicate onto the mesh (NOT a bare device_put: params are already
        # global replicated arrays, which on a multi-process mesh are not
        # fully addressable and reject sharding-less placement)
        self.state = replicate_tree(state, self.mesh)
        self._build_steps()

    def _build_steps(self):
        model, task_loss = self.model, self.task_loss
        main_tx = self.main_tx
        is_gan = self.is_gan
        cdtype = compute_dtype_of(self.cfg)
        # TPU.DONATE: free the old train-state buffers inside the jitted step
        # (halves peak optimizer-state HBM). TPU.REMAT: rematerialize the
        # forward in the backward pass instead of saving activations — trades
        # FLOPs for HBM on 10k-token bags.
        donate = (0,) if bool(self.cfg.TPU.DONATE) else ()
        remat = bool(self.cfg.TPU.REMAT)
        sp = getattr(self, "sp_axis", None)

        def _gmean(x):
            """Global batch mean: per-data-shard means pmean'd under sp."""
            return jax.lax.pmean(x, "data") if sp else x

        def _shard_rng(rng):
            """Under sp the dropout rng enters shard_map replicated; fold in
            the data-axis index so each data shard draws independent masks
            for its own samples (seq shards keep the same per-sample rng —
            replicated tensors must see identical masks across seq, and the
            token-sharded bag folds the seq index in-model)."""
            return (
                jax.random.fold_in(rng, jax.lax.axis_index("data"))
                if sp
                else rng
            )

        _sp_specs = sp_batch_specs

        def _wrap_train(body):
            """jit (+ shard_map under sp) a (state, batch, *rest) step."""
            if not sp:
                return partial(jax.jit, donate_argnums=donate)(body)
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh

            def stepper(state, batch, *rest):
                fn = jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), _sp_specs(batch)) + (P(),) * len(rest),
                    out_specs=(P(), P(), P("data")),
                )
                return fn(state, batch, *rest)

            return partial(jax.jit, donate_argnums=donate)(stepper)

        def _maybe_remat(fn):
            return jax.checkpoint(fn) if remat else fn

        def _amp_apply(p, *args, **kw):
            """model.apply under the precision policy: params/inputs cast to
            the compute dtype, float outputs cast back to fp32."""
            out = model.apply(
                cast_floats(p, cdtype),
                *(cast_floats(a, cdtype) for a in args),
                **kw,
            )
            return cast_floats(out, jnp.float32) if cdtype else out

        if not is_gan:
            assert sp is None, (
                "sequence parallelism is implemented for the umeml_gan "
                "trainer path only"
            )
            use_bsm = bool(self.cfg.DATASET.USE_BSM)
            bs_micro = int(self.cfg.DATASET.BS_MICRO)
            bsm_alpha = float(self.cfg.MODEL.UMEML.ALPHA)

            @partial(jax.jit, donate_argnums=donate)
            def train_step(state, batch, rng):
                def loss_fn(p):
                    out = _maybe_remat(
                        lambda q: _amp_apply(
                            q, batch, train=True, rngs={"dropout": rng}
                        )
                    )(p)
                    loss = task_loss(out["logits"], batch) + out["modular_loss"]
                    return loss, out

                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state["params"]
                )
                updates, opt_state = main_tx.update(
                    grads, state["opt_state"], state["params"]
                )
                params = optax.apply_updates(state["params"], updates)
                return {"params": params, "opt_state": opt_state}, {"loss": loss}

            @partial(jax.jit, donate_argnums=donate)
            def train_step_bsm(state, batch, rng):
                """Chunk-averaged estimator (reference ``split_chunk`` +
                BSM branch, ``mbtrain.py:21-47,114-150``): the padded bag is
                randomly permuted over tokens and split into fixed
                ``BS_MICRO``-token chunks (indices sorted within each chunk,
                as the reference sorts); the loss is the mean over chunks of
                ``task + ALPHA * modularity``, one backward, one update —
                so EVERY patch of the slide contributes.  Pad tokens travel
                with their mask (the reference's sentinel rows ride along
                the same way)."""
                rng_perm, rng_drop = jax.random.split(rng)
                img, mask = batch["img"], batch["img_mask"]
                n = img.shape[1]
                n_chunks = -(-n // bs_micro)
                npad = n_chunks * bs_micro
                img_p = jnp.pad(img, ((0, 0), (0, npad - n), (0, 0)))
                mask_p = jnp.pad(mask, ((0, 0), (0, npad - n)))
                perm = jax.random.permutation(rng_perm, npad)
                idx = jnp.sort(perm.reshape(n_chunks, bs_micro), axis=1)

                def loss_fn(p):
                    def chunk(acc, take):
                        sub = dict(batch)
                        sub["img"] = jnp.take(img_p, take, axis=1)
                        sub["img_mask"] = jnp.take(mask_p, take, axis=1)
                        out = _maybe_remat(
                            lambda q: _amp_apply(
                                q, sub, train=True,
                                rngs={
                                    "dropout": jax.random.fold_in(
                                        rng_drop, take[0]
                                    )
                                },
                            )
                        )(p)
                        l = (
                            task_loss(out["logits"], batch)
                            + bsm_alpha * out["modular_loss"]
                        )
                        return acc + l, None

                    total, _ = jax.lax.scan(chunk, jnp.float32(0.0), idx)
                    return total / n_chunks

                loss, grads = jax.value_and_grad(loss_fn)(state["params"])
                updates, opt_state = main_tx.update(
                    grads, state["opt_state"], state["params"]
                )
                params = optax.apply_updates(state["params"], updates)
                return {"params": params, "opt_state": opt_state}, {"loss": loss}

            if use_bsm:
                train_step = train_step_bsm

            @jax.jit
            def eval_step(params, batch):
                out = _amp_apply(params, batch, train=False)
                return out["logits"], None, None

            self._train_steps = {False: train_step, True: train_step}
            self._eval_step = eval_step
            return

        gen_tx, dis_p_tx, dis_o_tx = self.gen_tx, self.dis_p_tx, self.dis_o_tx
        main_keys = self.main_keys

        def _make(train_gan: bool):
            def train_step(state, batch, rng, replace_ratio):
                params = state["params"]
                rng_d, rng_g = jax.random.split(_shard_rng(rng))
                metrics = {}
                gen_opt, dis_p_opt, dis_o_opt = (
                    state["gen_opt"],
                    state["dis_p_opt"],
                    state["dis_o_opt"],
                )
                # ---- ONE bag-sized encode forward for the whole step: the
                # GAN phase reads its (detached) values and the main loss
                # gets its encoder backward through enc_vjp — no second
                # forward (the reference also computes a single forward; its
                # GAN step runs inside it, ref umeml_gan.py:461-490)
                def enc_fn(p):
                    return _amp_apply(
                        p,
                        batch,
                        train=True,
                        method=UMEML_GAN.encode,
                        rngs={"dropout": rng_d},
                    )

                enc, enc_vjp = jax.vjp(_maybe_remat(enc_fn), params)
                h_path, h_omic = enc["h_path"], enc["h_omic"]

                if train_gan:
                    gen_sub = _take(params, GEN_KEYS)
                    gen_loss, gen_grads = jax.value_and_grad(
                        lambda s: _gmean(model.apply(
                            _merge(params, s), h_path, h_omic,
                            method=UMEML_GAN.gen_loss,
                        ))
                    )(gen_sub)
                    gu, gen_opt = gen_tx.update(gen_grads, gen_opt, gen_sub)
                    params = _merge(params, optax.apply_updates(gen_sub, gu))

                    dp_sub = _take(params, ("gan_discriminator_p",))
                    dp_loss, dp_grads = jax.value_and_grad(
                        lambda s: _gmean(model.apply(
                            _merge(params, s), h_path, h_omic,
                            method=UMEML_GAN.dis_p_loss,
                        ))
                    )(dp_sub)
                    du, dis_p_opt = dis_p_tx.update(dp_grads, dis_p_opt, dp_sub)
                    params = _merge(params, optax.apply_updates(dp_sub, du))

                    do_sub = _take(params, ("gan_discriminator_o",))
                    do_loss, do_grads = jax.value_and_grad(
                        lambda s: _gmean(model.apply(
                            _merge(params, s), h_path, h_omic,
                            method=UMEML_GAN.dis_o_loss,
                        ))
                    )(do_sub)
                    du2, dis_o_opt = dis_o_tx.update(do_grads, dis_o_opt, do_sub)
                    params = _merge(params, optax.apply_updates(do_sub, du2))
                    metrics.update(
                        loss_gen=gen_loss, loss_dis_p=dp_loss, loss_dis_o=do_loss
                    )

                # ---- main phase (updated generator params); differentiated
                # wrt BOTH the non-discriminator params (head/generator use)
                # and the encode outputs, whose cotangent enc_vjp turns into
                # encoder gradients without re-running the bag forward
                mg_sub = _take(params, main_keys)

                def main_fn(sub, enc_in):
                    out = _maybe_remat(
                        lambda s, e: _amp_apply(
                            _merge(params, s),
                            e,
                            batch,
                            train=True,
                            replace_ratio=replace_ratio,
                            rngs={
                                "dropout": jax.random.fold_in(rng_d, 1),
                                "gan": rng_g,
                            },
                            method=UMEML_GAN.finish,
                        )
                    )(sub, enc_in)
                    loss = _gmean(
                        task_loss(out["logits"], batch)
                        + out["modular_loss"]
                        + out["loss_kd"]
                    )
                    return loss, out

                (loss, out), (g_sub, g_enc) = jax.value_and_grad(
                    main_fn, argnums=(0, 1), has_aux=True
                )(mg_sub, enc)
                (g_enc_params,) = enc_vjp(g_enc)
                grads = jax.tree_util.tree_map(
                    jnp.add, g_sub, _take(g_enc_params, main_keys)
                )
                mu, opt_state = main_tx.update(grads, state["opt_state"], mg_sub)
                params = _merge(params, optax.apply_updates(mg_sub, mu))
                metrics["loss"] = loss
                new_state = {
                    "params": params,
                    "opt_state": opt_state,
                    "gen_opt": gen_opt,
                    "dis_p_opt": dis_p_opt,
                    "dis_o_opt": dis_o_opt,
                }
                return new_state, metrics, (
                    out["importance_path"],
                    out["importance_omic"],
                )

            return _wrap_train(train_step)

        self._train_steps = {False: _make(False), True: _make(True)}

        def eval_body(params, batch):
            out = _amp_apply(params, batch, train=False)
            return out["logits"], out["importance_path"], out["importance_omic"]

        if sp:
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh

            @jax.jit
            def eval_step(params, batch):
                fn = jax.shard_map(
                    eval_body,
                    mesh=mesh,
                    in_specs=(P(), _sp_specs(batch)),
                    out_specs=(P("data"), P("data"), P("data")),
                )
                return fn(params, batch)

        else:
            eval_step = jax.jit(eval_body)

        self._eval_step = eval_step

        # ---- CCA epoch pieces ------------------------------------------
        def _cca_sim(out):
            """similarity-alignment over the GLOBAL batch Gram — under sp
            the per-shard rows are all-gathered over 'data' first (plain
            jit sees the global batch already)."""
            b = out["h_path"].shape[0]
            pp = out["p_proto_before"].reshape(b, -1)
            hb = out["h_omic_bag_before"].reshape(b, -1)
            if sp:
                pp = jax.lax.all_gather(pp, "data", axis=0, tiled=True)
                hb = jax.lax.all_gather(hb, "data", axis=0, tiled=True)
                return jax.lax.pmean(
                    similarity_alignment_loss(pp, hb), "data"
                )
            return similarity_alignment_loss(pp, hb)

        _cca_train = bool(self.cfg.TRAIN.CURRICULUM.CCA_DROPOUT)

        def cca_values_body(params, batch, rng):
            out = model.apply(
                params, batch, train=_cca_train, cca=True,
                rngs={"dropout": _shard_rng(rng)},
            )
            b = out["h_path"].shape[0]
            hp = out["h_path"].reshape(b, -1)
            ho = out["h_omic"].reshape(b, -1)
            return hp, ho, _cca_sim(out)

        if sp:
            from jax.sharding import PartitionSpec as P

            mesh = self.mesh

            @jax.jit
            def cca_values(params, batch, rng):
                fn = jax.shard_map(
                    cca_values_body,
                    mesh=mesh,
                    in_specs=(P(), _sp_specs(batch), P()),
                    out_specs=(P("data"), P("data"), P()),
                )
                return fn(params, batch, rng)

        else:
            cca_values = jax.jit(cca_values_body)

        @jax.jit
        def cca_cotangents(hp_all, ho_all):
            val, grads = jax.value_and_grad(
                lambda hp, ho: cca_loss_fn(hp, ho), argnums=(0, 1)
            )(hp_all, ho_all)
            return val, grads

        def _chunk_surrogate(sub, fixed_params, batch, rng, g_hp, g_ho, w_sim):
            out = model.apply(
                _merge(fixed_params, sub),
                batch,
                train=_cca_train,
                cca=True,
                rngs={"dropout": _shard_rng(rng)},
            )
            b = out["h_path"].shape[0]
            hp = out["h_path"].reshape(b, -1)
            ho = out["h_omic"].reshape(b, -1)
            dots = jnp.sum(hp * g_hp) + jnp.sum(ho * g_ho)
            if sp:  # global inner product = psum of per-shard sums
                dots = jax.lax.psum(dots, "data")
            return dots + w_sim * _cca_sim(out)

        def cca_chunk_grads_body(params, batch, rng, g_hp, g_ho, w_sim):
            sub = _take(params, main_keys)
            return jax.grad(_chunk_surrogate)(
                sub, params, batch, rng, g_hp, g_ho, w_sim
            )

        if sp:

            @jax.jit
            def cca_chunk_grads(params, batch, rng, g_hp, g_ho, w_sim):
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(
                    cca_chunk_grads_body,
                    mesh=self.mesh,
                    in_specs=(P(), _sp_specs(batch), P(), P("data"),
                              P("data"), P()),
                    out_specs=P(),
                )
                return fn(params, batch, rng, g_hp, g_ho, w_sim)

        else:
            cca_chunk_grads = jax.jit(cca_chunk_grads_body)

        @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
        def cca_apply(params, cca_opt_state, grad_sum, tx_placeholder=None):
            sub = _take(params, main_keys)
            updates, cca_opt_state = self.cca_tx.update(grad_sum, cca_opt_state, sub)
            params = _merge(params, optax.apply_updates(sub, updates))
            return params, cca_opt_state

        self._cca_values = cca_values
        self._cca_cotangents = cca_cotangents
        self._cca_chunk_grads = cca_chunk_grads
        self._cca_apply = cca_apply
        self.cca_tx = optax.adam(float(self.cfg.TRAIN.CURRICULUM.CCA_LR))

    # ------------------------------------------------------------------ #
    # batch preparation                                                    #
    # ------------------------------------------------------------------ #
    def _to_device_mb(self, host_batch, raw_batch, tag: str):
        if self.bag_cache is not None and "index" in raw_batch:
            hb = dict(host_batch)
            hb["index"] = raw_batch["index"]
            return self.bag_cache.build(hb, self.mesh, tag)
        return device_batch(host_batch, self.mesh)

    def _host_batch(
        self,
        batch: Dict,
        train: bool,
        without_omic: Optional[np.ndarray] = None,
        insample_mask: Optional[np.ndarray] = None,
    ) -> Dict:
        out = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
        b = out["img"].shape[0]
        g = out["mol"].shape[1]
        out["without_omic"] = (
            without_omic if without_omic is not None else np.zeros((b,), np.float32)
        )
        out["insample_without_omic"] = (
            insample_mask
            if insample_mask is not None
            else np.zeros((b, g), np.int32)
        )
        out["omic_means"] = np.asarray(self.omic_means, np.float32)
        return out

    # ------------------------------------------------------------------ #
    # training loop with curriculum                                        #
    # ------------------------------------------------------------------ #
    def train(
        self,
        umeml_gan_test_without_omic_ratio: float = -1,
        umeml_gan_test_insample_without_omic_ratio: float = 0,
    ):
        self._test_without_ratio = umeml_gan_test_without_omic_ratio
        self._test_insample_ratio = umeml_gan_test_insample_without_omic_ratio
        cur = self.cfg.TRAIN.CURRICULUM
        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            if not self.is_gan or not cur.ENABLE:
                self.run_epoch(train_gan=False, replace_ratio=0.0)
            elif self.epoch < cur.GAN_START_EPOCH:
                self.run_epoch(train_gan=False, replace_ratio=0.0)
            elif self.epoch < cur.REPLACE_START_EPOCH:
                self.run_epoch(train_gan=True, replace_ratio=0.0)
            else:
                rs = cur.REPLACE_START_EPOCH
                ratio = (self.epoch + 1 - rs) / (self.max_epoch + 1 - rs) / 2
                self.run_epoch(train_gan=True, replace_ratio=ratio)
            if (
                self.is_gan
                and cur.ENABLE
                and cur.CCA_EVERY_EPOCH
                and self.epoch < self.max_epoch - 1
            ):
                self.run_epoch_cca()
            self.after_epoch()
        return self.after_train()

    def run_epoch(self, train_gan: bool = False, replace_ratio: float = 0.0):
        import time as _time

        self._open_imp_files("train")

        losses = MetricMeter()
        batch_time = AverageMeter()
        num_batches = len(self.train_loader)
        n_slides = 0
        step = self._train_steps[bool(train_gan)]
        pending = []  # (batch_idx, true batch size, device metrics, device imp)

        def flush():
            if not pending:
                return
            host = fetch_global([(m, imp) for _, _, m, imp in pending])
            for (bi, b, _, _), (metrics, imp) in zip(pending, host):
                metrics = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(metrics["loss"]):
                    raise FloatingPointError("Loss is infinite or NaN!")
                losses.update(metrics)
                if imp is not None:
                    # drop wrap-pad rows (device_batch) from the dump
                    self._dump_importance("train", imp[0][:b], imp[1][:b])
                n_iter = self.epoch * num_batches + bi
                for name, value in metrics.items():
                    self.writer.write_scalar("train/" + name, value, n_iter)
            pending.clear()

        # hoist per-step host->device transfers out of the hot loop: ONE
        # device-side split provides every step's rng, and replace_ratio is
        # uploaded once per epoch (a fresh PRNGKey + jnp.float32 per step
        # cost ~3 ms/step of transfer latency through a remote-TPU tunnel)
        epoch_keys = list(jax.random.split(self.rng, num_batches + 1))
        self.rng = epoch_keys.pop()
        rr = jnp.float32(replace_ratio)

        end = _time.time()
        for batch_idx, batch in enumerate(self.train_loader):
            db = self._to_device_mb(self._host_batch(batch, train=True), batch, "train")
            if self.is_gan:
                self.state, metrics, imp = step(
                    self.state, db, epoch_keys[batch_idx], rr
                )
            else:
                self.state, metrics = step(self.state, db, epoch_keys[batch_idx])
                imp = None
            pending.append((batch_idx, len(batch["patient_id"]), metrics, imp))
            n_slides += len(batch["patient_id"])
            batch_time.update(_time.time() - end)

            if (batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0 or (
                num_batches < self.cfg.TRAIN.PRINT_FREQ
            ):
                flush()
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}] "
                    f"batch [{batch_idx + 1}/{num_batches}] "
                    f"time {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                    f"{losses} lr {self.get_current_lr():.4e} "
                    f"gan={train_gan} rr={replace_ratio:.3f}"
                )
            end = _time.time()
        flush()
        self.writer.write_scalar(
            "train/slides_per_sec", n_slides / max(batch_time.sum, 1e-9), self.epoch
        )
        self._plot_importance()

    def run_epoch_cca(self):
        """CCA alignment epoch (ref ``trainer.py:672-739``), exact chunked
        gradients, fresh Adam per epoch."""
        cur = self.cfg.TRAIN.CURRICULUM
        threshold = int(cur.CCA_ACCUM_BATCHES)
        cca_opt_state = self.cca_tx.init(_take(self.state["params"], self.main_keys))
        num_batches = len(self.train_loader)

        group: List = []
        for batch_idx, batch in enumerate(self.train_loader):
            db = self._to_device_mb(self._host_batch(batch, train=True), batch, "train")
            rng = self.next_rng()
            hp, ho, sim = self._cca_values(self.state["params"], db, rng)
            group.append((db, rng, hp, ho, sim))
            if batch_idx == num_batches - 1 or len(group) == threshold:
                hp_all = jnp.concatenate([g[2] for g in group], axis=0)
                ho_all = jnp.concatenate([g[3] for g in group], axis=0)
                cca_val, (g_hp, g_ho) = self._cca_cotangents(hp_all, ho_all)
                batch_loss = jnp.mean(jnp.stack([g[4] for g in group]))
                w_sim = 1.0 / len(group)
                grad_sum = None
                offset = 0
                for db_i, rng_i, hp_i, _, _ in group:
                    b = hp_i.shape[0]
                    gi = self._cca_chunk_grads(
                        self.state["params"],
                        db_i,
                        rng_i,
                        g_hp[offset : offset + b],
                        g_ho[offset : offset + b],
                        jnp.float32(w_sim),
                    )
                    offset += b
                    grad_sum = (
                        gi
                        if grad_sum is None
                        else jax.tree_util.tree_map(jnp.add, grad_sum, gi)
                    )
                params, cca_opt_state = self._cca_apply(
                    self.state["params"], cca_opt_state, grad_sum
                )
                self.state["params"] = params
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}] CCA "
                    f"batch [{batch_idx + 1}/{num_batches}] "
                    f"cca_loss {float(cca_val):.4f} batch_loss {float(batch_loss):.4f}"
                )
                self.writer.write_scalar(
                    "train/cca_loss", float(cca_val), self.epoch * num_batches + batch_idx
                )
                group = []

    # ------------------------------------------------------------------ #
    # evaluation with omics-ablation knobs                                 #
    # ------------------------------------------------------------------ #
    def after_epoch(self):
        # route the omics-ablation ratios into test (ref after_epoch)
        self._eval_ratios = (
            getattr(self, "_test_without_ratio", 0),
            getattr(self, "_test_insample_ratio", 0),
        )
        super().after_epoch()

    def test(
        self,
        split: Optional[str] = None,
        umeml_gan_test_without_omic_ratio: Optional[float] = None,
        umeml_gan_test_insample_without_omic_ratio: Optional[float] = None,
        **kwargs,
    ) -> float:
        without_ratio, insample_ratio = getattr(self, "_eval_ratios", (0, 0))
        if umeml_gan_test_without_omic_ratio is not None:
            without_ratio = umeml_gan_test_without_omic_ratio
        if umeml_gan_test_insample_without_omic_ratio is not None:
            insample_ratio = umeml_gan_test_insample_without_omic_ratio
        without_ratio = max(float(without_ratio), 0.0)
        insample_ratio = max(float(insample_ratio), 0.0)

        self.evaluator.reset()
        if split is None:
            split = self.cfg.TEST.SPLIT
        if split == "val" and self.val_loader is not None:
            loader = self.val_loader
        else:
            split = "test"
            loader = self.test_loader

        # sample-level omics removal, seed 42 (ref mbtrain.py:303-310)
        num_samples = len(loader.dataset)
        num_selected = int(num_samples * without_ratio)
        indexes_without = np.random.RandomState(42).choice(
            num_samples, num_selected, replace=False
        )

        self._open_imp_files(split)

        print(f"Evaluate on the *{split}* set")
        batch_start = 0
        pending = []  # defer device->host readbacks to one device_get
        for batch_index, batch in enumerate(loader):
            b = batch["img"].shape[0]
            without = np.isin(
                np.arange(batch_start, batch_start + b), indexes_without
            ).astype(np.float32)
            batch_start += b
            seed = (10000 if split == "val" else 20000) + batch_index
            insample = get_omic_delete_mask(
                b, batch["mol"].shape[1], insample_ratio, seed=seed
            )
            hb = self._host_batch(
                batch, train=False, without_omic=without, insample_mask=insample
            )
            db = self._to_device_mb(hb, batch, split)
            logits, imp_p, imp_o = self._eval_step(self.state["params"], db)
            pending.append(((logits, imp_p, imp_o), batch))
        host = fetch_global([p for p, _ in pending])
        for (logits, imp_p, imp_o), (_, batch) in zip(host, pending):
            b = len(batch["patient_id"])  # drop wrap-pad rows (device_batch)
            if imp_p is not None:
                self._dump_importance(split, imp_p[:b], imp_o[:b])
            self.process_eval_batch(np.asarray(logits)[:b], batch)

        results = self.evaluator.evaluate()
        for k, v in results.items():
            if self.writer:
                self.writer.write_scalar(f"{split}/{k}", v, self.epoch)
        if self.cfg.MODEL.NAME.endswith("_plot"):
            self._plot_similarity(split, loader)
        return list(results.values())[0]

    def eval_logits(self, batch, split, batch_index):  # pragma: no cover
        raise NotImplementedError("MBTRAIN overrides test() directly")

    def test_new(
        self,
        cfg=None,
        split: str = "test",
        umeml_gan_test_without_omic_ratio: float = 0,
        umeml_gan_test_insample_without_omic_ratio: float = 0,
        **kwargs,
    ) -> float:
        """External-cohort (CPTAC) evaluation
        (reference ``mbtrain.py:379-489`` + ``dataset_new.py``)."""
        from ..data.external import build_test_new

        without_ratio = max(float(umeml_gan_test_without_omic_ratio), 0.0)
        insample_ratio = max(float(umeml_gan_test_insample_without_omic_ratio), 0.0)
        _, loader = build_test_new(self.cfg, omic_dim=self.dm.omic_dim)
        self.evaluator.reset()

        num_samples = len(loader.dataset)
        num_selected = int(num_samples * without_ratio)
        indexes_without = np.random.RandomState(42).choice(
            num_samples, num_selected, replace=False
        )

        self._open_imp_files("test_new")

        print(f"Evaluate on the *external test* set ({num_samples} samples)")
        batch_start = 0
        pending = []
        for batch_index, batch in enumerate(loader):
            b = batch["img"].shape[0]
            ratio_without = np.isin(
                np.arange(batch_start, batch_start + b), indexes_without
            ).astype(np.float32)
            # samples with missing omics always use the generator
            without = np.maximum(ratio_without, batch["without_omic"])
            batch_start += b
            seed = 20000 + batch_index
            insample = get_omic_delete_mask(
                b, batch["mol"].shape[1], insample_ratio, seed=seed
            )
            hb = self._host_batch(
                batch, train=False, without_omic=without, insample_mask=insample
            )
            db = self._to_device_mb(hb, batch, "test_new")
            logits, imp_p, imp_o = self._eval_step(self.state["params"], db)
            pending.append(((logits, imp_p, imp_o), batch))
        host = fetch_global([p for p, _ in pending])
        for (logits, imp_p, imp_o), (_, batch) in zip(host, pending):
            b = len(batch["patient_id"])  # drop wrap-pad rows (device_batch)
            if imp_p is not None:
                self._dump_importance("test_new", imp_p[:b], imp_o[:b])
            self.process_eval_batch(np.asarray(logits)[:b], batch)

        results = self.evaluator.evaluate()
        for k, v in results.items():
            if self.writer:
                self.writer.write_scalar(f"test_new/{k}", v, self.epoch)
        return list(results.values())[0]

    # ------------------------------------------------------------------ #
    # interpretability dumps                                               #
    # ------------------------------------------------------------------ #
    def _open_imp_files(self, prefix: str) -> None:
        """Truncate + register the per-split importance dumps (ref
        ``trainer.py:617-618``).  Primary-only on pods: every process
        computes identical rows, so non-primary writers would duplicate
        them on a shared FS (``_dump_importance``/``_plot_importance``
        no-op when the registry stays empty)."""
        self._imp_files = {}
        if jax.process_index() != 0:
            return
        for mod in ("path", "omic"):
            fp = osp.join(self.output_dir, f"{prefix}_{mod}.txt")
            open(fp, "w").close()
            self._imp_files[mod] = fp

    def _dump_importance(self, split: str, imp_path, imp_omic):
        files = getattr(self, "_imp_files", None)
        if not files:
            return
        for mod, arr in (("path", imp_path), ("omic", imp_omic)):
            arr = np.asarray(arr)
            with open(files[mod], "a") as f:
                for row in arr:
                    f.write(" ".join(str(float(x)) for x in row) + "\n")

    def _plot_similarity(self, split: str, loader):
        """Per-sample path x omic similarity grids (the ``umeml_gan_plot``
        variant, ref ``umeml_gan_plot.py:124-168``): one ``sim_<patient>.png``
        block grid per eval sample. The grid is sown inside the jitted
        bottleneck forward and rendered on host afterwards — no host I/O
        inside the compiled step, unlike the reference."""
        if jax.process_index() != 0:
            return  # pods: PNG writers are primary-only (shared FS)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from matplotlib import patches as mpatches
        except Exception:
            return
        model = self.model
        sp = getattr(self, "sp_axis", None)
        if not hasattr(self, "_sim_step"):

            def sim_body(params, batch):
                _, inter = model.apply(
                    params, batch, train=False, mutable=["intermediates"]
                )
                leaves = [
                    v
                    for path, v in jax.tree_util.tree_leaves_with_path(inter)
                    if any(
                        getattr(k, "key", None) == "similarity" for k in path
                    )
                ]
                return leaves[0] if leaves else None

            if sp:
                # the eval forward contains seq-axis collectives (the
                # distributed-softmax prototype cross-attention), so the
                # sowing pass runs under shard_map like the eval step; the
                # [B, P, O] grid itself is tiny and replicated over seq
                from jax.sharding import PartitionSpec as P

                mesh = self.mesh

                def sim_step(params, batch):
                    return jax.shard_map(
                        sim_body,
                        mesh=mesh,
                        in_specs=(P(), sp_batch_specs(batch)),
                        out_specs=P("data"),
                    )(params, batch)

                self._sim_step = jax.jit(sim_step)
            else:
                self._sim_step = jax.jit(sim_body)

        plot_dir = osp.join(self.output_dir, "plots")
        os.makedirs(plot_dir, exist_ok=True)
        for batch in loader:
            hb = self._host_batch(batch, train=False)
            db = self._to_device_mb(hb, batch, split)
            sim = self._sim_step(self.state["params"], db)
            if sim is None:
                return
            sim = np.asarray(sim)
            for i, pid in enumerate(batch["patient_id"]):
                grid = sim[i]
                grid = (grid - grid.min()) / (grid.max() - grid.min() + 1e-6)
                grid = grid * 0.5 + 0.5  # ref rescale into the upper Blues half
                gap, block = 5, 20
                fig_size = (block + gap) * grid.shape[1] / 100
                fig, ax = plt.subplots(figsize=(fig_size, fig_size), dpi=100)
                for r in range(grid.shape[0]):
                    for c in range(grid.shape[1]):
                        ax.add_patch(
                            mpatches.Rectangle(
                                (c * (block + gap), r * (block + gap)),
                                block,
                                block,
                                linewidth=0,
                                facecolor=plt.cm.Blues(grid[r, c]),
                            )
                        )
                ax.set_xlim(0, grid.shape[1] * (block + gap))
                ax.set_ylim(0, grid.shape[0] * (block + gap))
                ax.invert_yaxis()
                ax.axis("off")
                fig.patch.set_alpha(0.0)
                fig.savefig(
                    osp.join(plot_dir, f"sim_{pid}.png"),
                    bbox_inches="tight",
                    pad_inches=0.1,
                    transparent=True,
                )
                plt.close(fig)

    def _plot_importance(self):
        """Render the epoch's importance matrices to PNGs
        (ref ``trainer.py:27-44``); skipped when matplotlib is absent."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        for mod, fp in getattr(self, "_imp_files", {}).items():
            try:
                data = np.loadtxt(fp)
            except Exception:
                continue
            if data.size == 0:
                continue
            data = np.atleast_2d(data)
            fig = plt.figure(figsize=(data.shape[1] / 10, max(data.shape[0], 1) / 10))
            ax = fig.add_axes([0, 0, 1, 1])
            ax.imshow(data, cmap="Blues", aspect="auto", interpolation="nearest")
            ax.axis("off")
            fig.savefig(fp.replace(".txt", ".png"), dpi=100)
            plt.close(fig)

    # ------------------------------------------------------------------ #
    # state                                                                #
    # ------------------------------------------------------------------ #
    def state_dict(self):
        return {
            "state": self.state,
            "epoch": self.epoch + 1,
            "val_result": float(self.best_result)
            if np.isfinite(self.best_result)
            else -1.0,
        }

    def load_state_dict(self, state):
        # restored checkpoints are host numpy trees; replicate them onto the
        # mesh (pod-safe — bare device_put rejects multi-process meshes)
        self.state = replicate_tree(state["state"], self.mesh)
