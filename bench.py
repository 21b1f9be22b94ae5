"""Benchmark: UMEML_GAN survival training throughput (slides/sec) on the
available accelerator, at the reference workload scale (bag padded to
10,000 x 512-d features, hidden 256, 6 prototypes — reference
``configs/Survival/UMEML_GAN.yaml`` + ``data_manager.py:387``).

The timed region is the FULL jitted train step with the GAN phase on
(encoder + generator/discriminator/main updates), i.e. the reference's
hot loop #1 + #2 (SURVEY.md §3).

Canonical batch: **8** — the validated throughput configuration
(``configs/Survival/UMEML_GAN_THROUGHPUT.yaml``: batch 8 + linearly
scaled lr).  The r4 batch sweep measured saturation at batch 8 (242.9
slides/s; batch 16 buys nothing), and the round-5 quality gate validated
it at the FULL 10-epoch reference curriculum on identical folds: 5-fold
C-index 87.60 +- 2.24 vs the batch-2 control's 83.93 +- 6.23 — mean AND
spread better than the reference schedule (BASELINE.md r5).  Pass
``--batch-size 2`` for the reference-schedule row (the r1-r4 canonical
shape; the recorded self-baseline is batch-2, so vs_baseline composes
batch scaling x kernel speedups).

Baseline protocol: the reference publishes no numbers (BASELINE.md), so the
baseline is self-recorded — the first run writes ``bench_baseline.json`` and
reports vs_baseline=1.0; subsequent runs report speedup relative to that
recording. Prints ONE JSON line.
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np


# reference gene-group sizes (umeml_gan.py:274)
GENE_GROUP_SIZES = (82, 330, 513, 440, 1538, 451)


def build_canonical_model(hidden=256):
    """The canonical bench model (UMEML_GAN at the shipped config).

    One definition shared by :func:`build_step` and tools/bench_anatomy.py so
    the piecewise step anatomy always times the same model the full-step
    bench runs.  Returns ``(cfg, model)``.
    """
    from imp_tpu.config import get_cfg_default
    from imp_tpu.models import build_model

    cfg = get_cfg_default()
    cfg.MODEL.NAME = "umeml_gan"
    cfg.MODEL.HIDDEN_DIM = hidden
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.DROPOUT = 0.25
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    starts = np.cumsum([0] + list(GENE_GROUP_SIZES))
    groups = [list(range(starts[i], starts[i + 1])) for i in range(len(GENE_GROUP_SIZES))]
    model = build_model("umeml_gan", cfg=cfg, num_classes=4, gene_group_indexes=groups)
    return cfg, model


def build_step(batch_size=2, bag_pad=10000, feat_dim=512, num_genes=3360, hidden=256, prec="fp32",
               no_gan=False, no_mod=False, no_opt=False, no_kd=False):
    import jax
    import jax.numpy as jnp

    from imp_tpu.engine.mbtrain import GEN_KEYS, DIS_KEYS, _merge, _take
    from imp_tpu.losses import build_loss
    from imp_tpu.models.umeml_gan import UMEML_GAN
    from imp_tpu.optim import build_optimizer
    import optax

    cfg, model = build_canonical_model(hidden=hidden)
    cfg.OPTIM.LR = 2e-4
    cfg.OPTIM.WEIGHT_DECAY = 1e-4
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.MAX_EPOCH = 10

    rng = np.random.default_rng(0)
    lengths = rng.integers(bag_pad // 3, bag_pad, size=batch_size)
    lengths[-1] = bag_pad
    batch = {
        "img": jnp.asarray(rng.normal(size=(batch_size, bag_pad, feat_dim)), jnp.float32),
        "img_mask": jnp.asarray(np.arange(bag_pad)[None, :] < lengths[:, None]),
        "mol": jnp.asarray(rng.lognormal(size=(batch_size, num_genes)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, batch_size), jnp.int32),
        "censorship": jnp.asarray(rng.integers(0, 2, batch_size), jnp.float32),
        "without_omic": jnp.zeros((batch_size,), jnp.float32),
        "insample_without_omic": jnp.zeros((batch_size, num_genes), jnp.int32),
        "omic_means": jnp.ones((num_genes,), jnp.float32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "gan": jax.random.PRNGKey(2)},
        batch, method="init_all",
    )
    main_keys = tuple(k for k in params["params"] if k not in DIS_KEYS)
    main_tx = build_optimizer(cfg.OPTIM, updates_per_epoch=100)
    gan_tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(eps=1e-8),
        optax.scale_by_learning_rate(1e-4),
    )
    loss_obj = build_loss("nllsurvloss_new", alpha=0.0, reduction="mean")

    state = {
        "params": params,
        "opt_state": main_tx.init(_take(params, main_keys)),
        "gen_opt": gan_tx.init(_take(params, GEN_KEYS)),
        "dis_p_opt": gan_tx.init(_take(params, ("gan_discriminator_p",))),
        "dis_o_opt": gan_tx.init(_take(params, ("gan_discriminator_o",))),
    }

    from functools import partial

    from imp_tpu.engine.trainer import cast_floats

    cdtype = jnp.bfloat16 if prec in ("bf16", "amp", "fp16") else None

    def _amp_apply(p, *args, **kw):
        out = model.apply(
            cast_floats(p, cdtype),
            *(cast_floats(a, cdtype) for a in args),
            **kw,
        )
        return cast_floats(out, jnp.float32) if cdtype else out

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng, replace_ratio):
        params = state["params"]
        rng_d, rng_g = jax.random.split(rng)

        # ONE bag-sized encode forward shared by GAN phase + main loss
        # (mirrors imp_tpu/engine/mbtrain.py)
        def enc_fn(p):
            return _amp_apply(p, batch, train=True, method=UMEML_GAN.encode,
                              rngs={"dropout": rng_d})

        enc, enc_vjp = jax.vjp(enc_fn, params)
        h_path, h_omic = enc["h_path"], enc["h_omic"]
        import optax as _optax

        gen_opt, dis_p_opt, dis_o_opt = (
            state["gen_opt"], state["dis_p_opt"], state["dis_o_opt"])
        if not no_gan:
            gen_sub = _take(params, GEN_KEYS)
            gen_loss, gen_grads = jax.value_and_grad(
                lambda s: model.apply(_merge(params, s), h_path, h_omic,
                                      method=UMEML_GAN.gen_loss))(gen_sub)
            gu, gen_opt = gan_tx.update(gen_grads, state["gen_opt"], gen_sub)
            params = _merge(params, _optax.apply_updates(gen_sub, gu))

            dp_sub = _take(params, ("gan_discriminator_p",))
            dpl, dpg = jax.value_and_grad(
                lambda s: model.apply(_merge(params, s), h_path, h_omic,
                                      method=UMEML_GAN.dis_p_loss))(dp_sub)
            du, dis_p_opt = gan_tx.update(dpg, state["dis_p_opt"], dp_sub)
            params = _merge(params, _optax.apply_updates(dp_sub, du))
            do_sub = _take(params, ("gan_discriminator_o",))
            dol, dog = jax.value_and_grad(
                lambda s: model.apply(_merge(params, s), h_path, h_omic,
                                      method=UMEML_GAN.dis_o_loss))(do_sub)
            du2, dis_o_opt = gan_tx.update(dog, state["dis_o_opt"], do_sub)
            params = _merge(params, _optax.apply_updates(do_sub, du2))

        mg_sub = _take(params, main_keys)

        def main_fn(sub, enc_in):
            out = _amp_apply(_merge(params, sub), enc_in, batch, train=True,
                             replace_ratio=replace_ratio,
                             rngs={"dropout": jax.random.fold_in(rng_d, 1),
                                   "gan": rng_g},
                             method=UMEML_GAN.finish)
            loss = loss_obj(out["logits"], batch["label"], batch["censorship"])
            if not no_mod:
                loss = loss + out["modular_loss"]
            if not no_kd:
                loss = loss + out["loss_kd"]
            return loss

        loss, (g_sub, g_enc) = jax.value_and_grad(main_fn, argnums=(0, 1))(
            mg_sub, enc)
        (g_enc_params,) = enc_vjp(g_enc)
        grads = jax.tree_util.tree_map(
            jnp.add, g_sub, _take(g_enc_params, main_keys))
        if no_opt:
            # consume the gradients without the optimizer update
            loss = loss + 0.0 * jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), grads, jnp.float32(0.0))
            opt_state = state["opt_state"]
        else:
            mu, opt_state = main_tx.update(grads, state["opt_state"], mg_sub)
            params = _merge(params, _optax.apply_updates(mg_sub, mu))
        return {
            "params": params, "opt_state": opt_state, "gen_opt": gen_opt,
            "dis_p_opt": dis_p_opt, "dis_o_opt": dis_o_opt,
        }, loss

    return train_step, state, batch


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", default="fp32", choices=["fp32", "bf16", "amp"])
    # canonical = 8, the quality-validated throughput shape (module
    # docstring); --batch-size 2 reproduces the reference-schedule row
    ap.add_argument("--batch-size", type=int, default=8)
    # in-step knockouts for cost attribution (the honest way to measure a
    # phase's marginal cost: isolated jit calls carry ~2-4 ms of tunnel
    # dispatch overhead each, so knockout deltas on the FULL step are used
    # for the BASELINE.md anatomy instead)
    for k in ("no-gan", "no-mod", "no-opt", "no-kd"):
        ap.add_argument(f"--{k}", action="store_true")
    args = ap.parse_args()

    batch_size = args.batch_size
    train_step, state, batch = build_step(
        batch_size=batch_size, prec=args.prec, no_gan=args.no_gan,
        no_mod=args.no_mod, no_opt=args.no_opt, no_kd=args.no_kd)

    # warmup / compile.  NOTE: under this environment's remote-TPU tunnel
    # block_until_ready() does NOT wait for device completion, so timing
    # forces a host readback of a value that depends on the whole chain
    # (the train state threads through every step, serializing them).
    # The burn-in LOOP matters: the first timed execution in a process runs
    # ~10x slow (executable upload / device cold start through the tunnel,
    # see BASELINE.md) — a single warmup step is not enough.
    # per-step host->device uploads (a fresh PRNGKey / jnp.float32 per
    # iteration) cost ~3 ms/step of tunnel transfer latency and are NOT part
    # of the train step — the trainer hoists them per-epoch (mbtrain.run_epoch)
    # and so does the bench: keys pre-split on device, replace_ratio uploaded
    # once.
    # protocol: 8 burn-in steps, then 5 timed windows of 15; report the
    # BEST window. The first timed window in a process reads slow even
    # after burn-in (executable upload / cold start through the tunnel,
    # BASELINE.md measurement notes), and host-side hiccups on this 1-core
    # machine only ever ADD time — max-of-windows estimates the device
    # rate, min-of-windows the interference. 5 windows (was 3) because
    # the measured inter-window spread within one process is ~±4%: more
    # windows tighten the best-window estimate of the true device rate
    # at a cost of ~2 s.
    windows, iters = 5, 15
    keys = list(
        jax.random.split(jax.random.PRNGKey(1), windows * iters + 8)
    )
    rr = jnp.float32(0.1)
    for i in range(8):
        state, loss = train_step(state, batch, keys[windows * iters + i], rr)
    _ = float(loss)

    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(w * iters, (w + 1) * iters):
            state, loss = train_step(state, batch, keys[i], rr)
        _ = float(loss)  # forces the full chain
        best_dt = min(best_dt, time.perf_counter() - t0)
    slides_per_sec = batch_size * iters / best_dt

    base_path = osp.join(osp.dirname(osp.abspath(__file__)), "bench_baseline.json")
    if osp.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f)["slides_per_sec"]
    else:
        baseline = slides_per_sec
        with open(base_path, "w") as f:
            json.dump(
                {
                    "slides_per_sec": slides_per_sec,
                    "note": "self-recorded r1 baseline (reference publishes no numbers)",
                    "device": str(jax.devices()[0]),
                },
                f,
            )
    print(
        json.dumps(
            {
                "metric": "umeml_gan_train_slides_per_sec_bag10k",
                "value": round(slides_per_sec, 3),
                "unit": "slides/sec",
                "vs_baseline": round(slides_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
