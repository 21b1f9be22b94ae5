"""LR-schedule golden parity vs the reference's torch scheduler chain
(warmup wrapper + single_step/multi_step/cosine, stepped per epoch), and
optimizer semantics checks."""

import numpy as np
import pytest
import torch

from reference_shim import load_ref_module

from imp_tpu.config import get_cfg_default
from imp_tpu.optim import lr_at_epoch


def _patch_lr_scheduler_verbose():
    """torch>=2.x removed the positional `verbose` arg the reference passes
    (lr_scheduler.py:22); restore tolerance for it."""
    base = torch.optim.lr_scheduler.LRScheduler
    if getattr(base.__init__, "_verbose_patched", False):
        return
    orig = base.__init__

    def patched(self, optimizer, last_epoch=-1, verbose=False):
        orig(self, optimizer, last_epoch)

    patched._verbose_patched = True
    base.__init__ = patched


def _torch_lrs(optim_cfg, max_epoch):
    _patch_lr_scheduler_verbose()
    ref = load_ref_module("medmm/optim/lr_scheduler.py", "ref_lr_sched")
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=optim_cfg.LR)
    sched = ref.build_lr_scheduler(opt, optim_cfg)
    lrs = []
    for _ in range(max_epoch):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


@pytest.mark.parametrize(
    "name,warmup_type,warmup_epoch,stepsize",
    [
        ("cosine", "linear", 1, (4000,)),
        ("cosine", "constant", 1, (4000,)),
        ("cosine", "linear", 3, (4000,)),
        ("single_step", "constant", 1, (5,)),
        ("single_step", "linear", 0, (-1,)),
        ("multi_step", "constant", 2, (3, 7)),
        ("cosine", "linear", 0, (4000,)),
    ],
)
def test_lr_schedule_matches_torch(name, warmup_type, warmup_epoch, stepsize):
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 2e-4
    cfg.OPTIM.LR_SCHEDULER = name
    cfg.OPTIM.MAX_EPOCH = 10
    cfg.OPTIM.WARMUP_EPOCH = warmup_epoch
    cfg.OPTIM.WARMUP_TYPE = warmup_type
    cfg.OPTIM.WARMUP_CONS_LR = 1e-5
    cfg.OPTIM.WARMUP_MIN_LR = 1e-5
    cfg.OPTIM.STEPSIZE = stepsize
    cfg.OPTIM.GAMMA = 0.1

    want = _torch_lrs(cfg.OPTIM, 10)
    got = [lr_at_epoch(cfg.OPTIM, e) for e in range(10)]
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_adam_coupled_l2_matches_torch():
    """One optax 'adam' step with weight decay == one torch Adam step."""
    import jax.numpy as jnp
    import optax

    from imp_tpu.optim import build_optimizer

    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = 1e-2
    cfg.OPTIM.WEIGHT_DECAY = 1e-3
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (-1,)
    cfg.OPTIM.WARMUP_EPOCH = -1
    cfg.OPTIM.MAX_EPOCH = 100

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    g = rng.normal(size=(5, 3)).astype(np.float32)

    # torch side (3 steps)
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=1e-2, weight_decay=1e-3)
    for _ in range(3):
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
    want = p.detach().numpy()

    # ours
    tx = build_optimizer(cfg.OPTIM, updates_per_epoch=10**6)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5, atol=1e-6)


def test_radam_matches_reference_buffered_variant():
    """12 steps of our radam vs the reference's buffered RAdam
    (ref medmm/optim/radam.py:18-130) across the N_sma<5 (SGD-degenerate)
    and N_sma>=5 (rectified) regimes, with decoupled weight decay."""
    import jax.numpy as jnp
    import optax

    from imp_tpu.optim import build_optimizer

    ref_radam = load_ref_module("medmm/optim/radam.py", "ref_radam")

    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "radam"
    cfg.OPTIM.LR = 1e-2
    cfg.OPTIM.WEIGHT_DECAY = 1e-3
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (-1,)
    cfg.OPTIM.WARMUP_EPOCH = -1
    cfg.OPTIM.MAX_EPOCH = 100

    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(12)]

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = ref_radam.RAdam([p], lr=1e-2, weight_decay=1e-3)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
    want = p.detach().numpy()

    tx = build_optimizer(cfg.OPTIM, updates_per_epoch=10**6)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-4, atol=1e-5)
