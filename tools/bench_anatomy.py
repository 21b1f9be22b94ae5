"""Step-cost anatomy for the canonical UMEML_GAN train step (batch 2,
bag 10,000 x 512, hidden 256 — reference ``configs/Survival/UMEML_GAN.yaml``
+ ``medmm/data/data_manager.py:387``).

Times each piece of the jitted step in isolation so BASELINE.md can record
where the milliseconds go (VERDICT r2 weak #1: the r1 anatomy went stale
after the modularity rewrite).  All timings follow the tunnel protocol
(untimed burn-in loop, data-dependency chaining, host readback of the final
scalar — see .claude/skills/verify/SKILL.md).

Usage::

    python tools/bench_anatomy.py [--prec fp32|bf16] [--iters 30]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np


def _chain_time(fn, state0, iters):
    """Run fn iters times threading state; returns seconds/iter.  The
    burn-in and the timed run share one chain (steps may donate their
    input buffers, so state0 must not be reused after the first call)."""
    s = state0
    for _ in range(5):  # burn-in (untimed)
        s = fn(s)
    _force(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    _force(s)
    return (time.perf_counter() - t0) / iters, s


def _force(tree):
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "sum")]
    return float(leaves[0].ravel()[0]) if leaves else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--only", default="",
                    help="comma-separated substrings; time only matching "
                         "sections (others are skipped entirely)")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]

    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from bench import build_canonical_model, build_step
    from imp_tpu.engine.mbtrain import GEN_KEYS, _merge, _take
    from imp_tpu.engine.trainer import cast_floats
    from imp_tpu.models.umeml_gan import UMEML_GAN
    from imp_tpu.ops.modularity import compute_modularity_pair

    # reuse bench.py's exact step construction for the full-step number
    train_step, state, batch = build_step(
        batch_size=args.batch_size, prec=args.prec
    )

    # rebuild the same model/params for piecewise timing (shared builder —
    # the anatomy must time exactly the model the full step runs)
    cfg, model = build_canonical_model()
    params = state["params"]
    cdtype = jnp.bfloat16 if args.prec == "bf16" else None

    def amp(p, b_, **kw):
        out = model.apply(cast_floats(p, cdtype), cast_floats(b_, cdtype), **kw)
        return cast_floats(out, jnp.float32) if cdtype else out

    rng = jax.random.PRNGKey(0)
    results = {}

    def timed(name, fn, s0):
        if only and not any(pat in name for pat in only):
            return s0
        dt, s_fin = _chain_time(fn, s0, args.iters)
        results[name] = dt * 1e3
        print(f"{name:34s} {dt*1e3:7.2f} ms", flush=True)
        return s_fin

    # ---- full step (threads full train state) ---------------------------
    def full(s):
        s2, loss = train_step(s, batch, rng, jnp.float32(0.1))
        return s2

    state = timed("full_train_step", full, state)
    params = state["params"]

    # ---- encode forward (chained through a scalar into the bag) ---------
    @jax.jit
    def enc_fwd(carry):
        b2 = dict(batch)
        b2["img"] = batch["img"] + carry
        out = amp(params, b2, train=True, method=UMEML_GAN.encode,
                  rngs={"dropout": rng})
        return out["h_path"].sum() * 0.0

    timed("encode_fwd", enc_fwd, jnp.float32(0.0))

    # ---- encode fwd+bwd wrt params --------------------------------------
    @jax.jit
    def enc_grad(carry):
        def f(p):
            b2 = dict(batch)
            b2["img"] = batch["img"] + carry
            out = amp(p, b2, train=True, method=UMEML_GAN.encode,
                      rngs={"dropout": rng})
            return out["h_path"].sum() + out["h_omic"].sum()

        g = jax.grad(f)(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), g, jnp.float32(0.0)
        ) * 0.0

    timed("encode_fwd_bwd", enc_grad, jnp.float32(0.0))

    # ---- full forward fwd only (encode + head + modularity) -------------
    @jax.jit
    def fwd_only(carry):
        b2 = dict(batch)
        b2["img"] = batch["img"] + carry
        out = amp(params, b2, train=True, replace_ratio=jnp.float32(0.1),
                  rngs={"dropout": rng, "gan": rng})
        return (out["logits"].sum() + out["modular_loss"]) * 0.0

    timed("main_fwd_only", fwd_only, jnp.float32(0.0))

    # ---- main fwd+bwd (the big value_and_grad, no optimizer) ------------
    main_keys = tuple(
        k for k in params["params"]
        if k not in ("gan_discriminator_p", "gan_discriminator_o")
    )

    @jax.jit
    def main_grad(carry):
        sub = _take(params, main_keys)

        def f(s):
            b2 = dict(batch)
            b2["img"] = batch["img"] + carry
            out = amp(_merge(params, s), b2, train=True,
                      replace_ratio=jnp.float32(0.1),
                      rngs={"dropout": rng, "gan": rng})
            return out["logits"].sum() + out["modular_loss"] + out["loss_kd"]

        g = jax.grad(f)(sub)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), g, jnp.float32(0.0)
        ) * 0.0

    timed("main_fwd_bwd", main_grad, jnp.float32(0.0))

    # ---- modularity pair fwd+bwd at bench shape -------------------------
    hb = jax.random.normal(jax.random.PRNGKey(1), (args.batch_size, 10000, 256))
    pp = jax.random.normal(jax.random.PRNGKey(2), (args.batch_size, 6, 256))
    ho = jax.random.normal(jax.random.PRNGKey(3), (args.batch_size, 7, 256))
    valid = batch["img_mask"]

    @jax.jit
    def mod_grad(carry):
        def f(t):
            p1, h1, b1 = t
            return compute_modularity_pair((p1, h1), b1 + carry, valid=valid)

        v, g = jax.value_and_grad(f)((pp, ho, hb))
        return (g[2].sum() + v) * 0.0

    timed("modularity_pair_fwd_bwd", mod_grad, jnp.float32(0.0))

    # ---- GAN phase alone (3 value_and_grads + 3 optax updates) ----------
    gan_tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(eps=1e-8),
        optax.scale_by_learning_rate(1e-4),
    )
    enc0 = amp(params, batch, train=True, method=UMEML_GAN.encode,
               rngs={"dropout": rng})
    h_path0, h_omic0 = enc0["h_path"], enc0["h_omic"]
    gan_state = {
        "params": params,
        "gen_opt": gan_tx.init(_take(params, GEN_KEYS)),
        "dis_p_opt": gan_tx.init(_take(params, ("gan_discriminator_p",))),
        "dis_o_opt": gan_tx.init(_take(params, ("gan_discriminator_o",))),
    }

    @jax.jit
    def gan_phase(s):
        p = s["params"]
        gen_sub = _take(p, GEN_KEYS)
        _, gg = jax.value_and_grad(
            lambda q: model.apply(_merge(p, q), h_path0, h_omic0,
                                  method=UMEML_GAN.gen_loss))(gen_sub)
        gu, gen_opt = gan_tx.update(gg, s["gen_opt"], gen_sub)
        p = _merge(p, optax.apply_updates(gen_sub, gu))
        dp_sub = _take(p, ("gan_discriminator_p",))
        _, dg = jax.value_and_grad(
            lambda q: model.apply(_merge(p, q), h_path0, h_omic0,
                                  method=UMEML_GAN.dis_p_loss))(dp_sub)
        du, dis_p_opt = gan_tx.update(dg, s["dis_p_opt"], dp_sub)
        p = _merge(p, optax.apply_updates(dp_sub, du))
        do_sub = _take(p, ("gan_discriminator_o",))
        _, og = jax.value_and_grad(
            lambda q: model.apply(_merge(p, q), h_path0, h_omic0,
                                  method=UMEML_GAN.dis_o_loss))(do_sub)
        du2, dis_o_opt = gan_tx.update(og, s["dis_o_opt"], do_sub)
        p = _merge(p, optax.apply_updates(do_sub, du2))
        return {"params": p, "gen_opt": gen_opt, "dis_p_opt": dis_p_opt,
                "dis_o_opt": dis_o_opt}

    timed("gan_phase(3 grads+updates)", gan_phase, gan_state)

    # ---- head fwd+bwd on fixed encoder outputs --------------------------
    @jax.jit
    def head_grad(carry):
        def f(p):
            out = model.apply(
                cast_floats(p, cdtype),
                cast_floats(h_path0, cdtype) + carry,
                cast_floats(h_omic0, cdtype),
                train=True,
                method=UMEML_GAN.head,
                rngs={"dropout": rng},
            )
            out = cast_floats(out, jnp.float32) if cdtype else out
            return out["logits"].sum() + out["loss_kd"]

        g = jax.grad(f)(params)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.sum(), g, jnp.float32(0.0)
        ) * 0.0

    timed("head_fwd_bwd", head_grad, jnp.float32(0.0))

    # ---- main optimizer update alone ------------------------------------
    from imp_tpu.optim import build_optimizer

    cfgo = get_cfg_default().OPTIM
    cfgo.LR = 2e-4
    cfgo.WEIGHT_DECAY = 1e-4
    cfgo.LR_SCHEDULER = "cosine"
    cfgo.WARMUP_EPOCH = 1
    cfgo.MAX_EPOCH = 10
    main_tx = build_optimizer(cfgo, updates_per_epoch=100)
    sub0 = _take(params, main_keys)
    zero_g = jax.tree_util.tree_map(jnp.ones_like, sub0)
    opt0 = main_tx.init(sub0)

    @partial(jax.jit, donate_argnums=())
    def opt_step(s):
        sub, opt = s
        u, opt = main_tx.update(zero_g, opt, sub)
        return optax.apply_updates(sub, u), opt

    timed("main_optimizer_update", opt_step, (sub0, opt0))

    # ---- param + batch casts (the bf16 tax) ------------------------------
    @jax.jit
    def cast_step(carry):
        p2 = cast_floats(params, jnp.bfloat16)
        b2 = cast_floats(batch, jnp.bfloat16)
        return (
            jax.tree_util.tree_reduce(
                lambda a, x: a + x.astype(jnp.float32).sum(), p2,
                jnp.float32(0.0),
            )
            + b2["img"].astype(jnp.float32).sum()
            + carry
        ) * 0.0

    timed("cast_params_and_batch_to_bf16", cast_step, jnp.float32(0.0))

    print("\nJSON:", __import__("json").dumps(
        {k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
