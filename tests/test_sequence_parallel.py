"""Sequence-parallel (seq-axis sharded) modularity + cross-attention vs the
single-device implementations — value AND gradient equivalence on a
(data=2, seq=4) mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imp_tpu.ops.modularity import compute_modularity_pair
from imp_tpu.parallel.sequence import (
    compute_modularity_pair_sp,
    cross_attention_tokens_sp,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "seq"))


def _bag(b=2, n=1024, d=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    lengths = np.array([700, 1024][:b])
    valid = jnp.asarray(np.arange(n)[None, :] < lengths[:, None])
    return x, valid


def test_sp_modularity_matches_single_device(mesh):
    b, n, d, p = 2, 1024, 64, 7
    x, valid = _bag(b, n, d)
    rng = np.random.default_rng(1)
    proto = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)
    homic = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)

    def loss_single(proto, homic):
        return compute_modularity_pair((proto, homic), x, valid)

    def loss_sp(proto, homic):
        fn = jax.shard_map(
            lambda pr, ho, xl, vl: compute_modularity_pair_sp(
                (pr, ho), xl, vl, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P(), P(), P(None, "seq", None), P(None, "seq")),
            out_specs=P(),
        )
        return fn(proto, homic, x, valid)

    want = float(jax.jit(loss_single)(proto, homic))
    got = float(jax.jit(loss_sp)(proto, homic))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-5)

    g_want = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(proto, homic)
    g_got = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(proto, homic)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-4, atol=1e-5)


def test_sp_cross_attention_matches_dense(mesh):
    b, n, d, p = 2, 512, 64, 7
    x, valid = _bag(b, n, d, seed=3)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)

    def dense(q):
        s = jnp.einsum("bpd,bnd->bpn", q * d**-0.5, x)
        s = jnp.where(valid[:, None, :], s, -jnp.finfo(jnp.float32).max)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bpn,bnd->bpd", a, x)

    sp = jax.shard_map(
        lambda q, xl, vl: cross_attention_tokens_sp(
            q, xl, xl, vl, axis_name="seq"
        ),
        mesh=mesh,
        in_specs=(P(), P(None, "seq", None), P(None, "seq")),
        out_specs=P(),
    )
    want = np.asarray(jax.jit(dense)(q))
    got = np.asarray(jax.jit(sp)(q, x, valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ring_modularity_matches_single_device(mesh):
    """Ring-streamed (ppermute) modularity: O(N/sp) per-device memory,
    value + gradient equal to the single-device loss."""
    from imp_tpu.parallel.sequence import compute_modularity_pair_ring

    b, n, d, p = 2, 1024, 64, 7
    x, valid = _bag(b, n, d, seed=7)
    rng = np.random.default_rng(8)
    proto = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)
    homic = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)

    def loss_single(proto, homic):
        return compute_modularity_pair((proto, homic), x, valid)

    def loss_ring(proto, homic):
        fn = jax.shard_map(
            lambda pr, ho, xl, vl: compute_modularity_pair_ring(
                (pr, ho), xl, vl, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P(), P(), P(None, "seq", None), P(None, "seq")),
            out_specs=P(),
        )
        return fn(proto, homic, x, valid)

    want = float(jax.jit(loss_single)(proto, homic))
    got = float(jax.jit(loss_ring)(proto, homic))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-5)

    g_want = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(proto, homic)
    g_got = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(proto, homic)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-4, atol=1e-5)


def test_mbtrain_sequence_parallel_end_to_end(tmp_path):
    """Opt-in trainer sequence parallelism: TPU.MESH_AXES=("data","seq")
    trains the flagship with bag tokens sharded over the seq axis; the eval
    forward matches the single-axis trainer bitwise-ish (same seed, no
    dropout at eval)."""
    from imp_tpu.config import get_cfg_default
    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer

    root = str(tmp_path / "spdata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)

    def _cfg(out, axes, shape):
        cfg = get_cfg_default()
        cfg.OUTPUT_DIR = str(tmp_path / out)
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
        cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
        cfg.DATALOADER.TEST.BATCH_SIZE = 4
        cfg.OPTIM.MAX_EPOCH = 2
        cfg.MODEL.NAME = "umeml_gan"
        cfg.MODEL.HIDDEN_DIM = 64
        cfg.MODEL.FUSION = "concat"
        cfg.MODEL.UMEML.PROTOTYPES = 6
        cfg.MODEL.UMEML.REGISTERS = 3
        cfg.TRAINER.NAME = "MBTRAIN"
        cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = 0
        cfg.TRAIN.CURRICULUM.CCA_ACCUM_BATCHES = 2
        cfg.TPU.MESH_AXES = axes
        cfg.TPU.MESH_SHAPE = shape
        cfg.TPU.PREFETCH = 0
        return cfg

    t_sp = build_trainer(_cfg("sp", ("data", "seq"), (4, 2)))
    assert t_sp.sp_axis == "seq"
    t_dp = build_trainer(_cfg("dp", ("data",), (-1,)))

    # identical init (same SEED, init traced on the non-sp twin) -> eval
    # forwards must agree across the two parallelism layouts
    r_sp = t_sp.test()
    r_dp = t_dp.test()
    assert r_sp == pytest.approx(r_dp, abs=1e-6)

    # and the sp trainer trains end-to-end (GAN phase + CCA epochs on)
    result = t_sp.train()
    assert np.isfinite(result)


def _flagship_sp_cfg(tmp_path, root, out, sp_attention, bag_pad=64,
                     batch=4, mesh_shape=(4, 2)):
    from imp_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path / out)
    cfg.SEED = 1
    cfg.DATASET.ROOT = root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = 1
    cfg.DATASET.BAG_PAD = bag_pad
    cfg.DATASET.PATH.DIM = 32
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss_new"
    cfg.TEST.EVALUATOR = "Survival_UMEML"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = batch
    cfg.DATALOADER.TEST.BATCH_SIZE = batch
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.MODEL.NAME = "umeml_gan"
    cfg.MODEL.HIDDEN_DIM = 64
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TRAINER.NAME = "MBTRAIN"
    cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = 0
    cfg.TRAIN.CURRICULUM.CCA_ACCUM_BATCHES = 2
    cfg.TPU.MESH_AXES = ("data", "seq")
    cfg.TPU.MESH_SHAPE = mesh_shape
    cfg.TPU.SP_ATTENTION = sp_attention
    cfg.TPU.PREFETCH = 0
    return cfg


def test_mbtrain_ring_flagship_step_parity(tmp_path):
    """TPU.SP_ATTENTION=ring wired through MBTRAIN/UMEML_GAN (VERDICT r4
    item 3): the full four-optimizer GAN train step under the ring layout
    produces the same losses as the gather sp layout on identical state,
    batch and rng (the two modularity variants are fp-reassociation twins),
    and the ring trainer trains end-to-end."""
    import jax
    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer
    from imp_tpu.engine.trainer import device_batch

    root = str(tmp_path / "ringdata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)

    t_gather = build_trainer(
        _flagship_sp_cfg(tmp_path, root, "fg_gather", "gather"))
    t_ring = build_trainer(_flagship_sp_cfg(tmp_path, root, "fg_ring", "ring"))
    assert t_ring.sp_axis == "seq" and t_ring.sp_mode == "ring"

    batch = next(iter(t_gather.train_loader))
    rng = jax.random.PRNGKey(7)
    ratio = jnp.float32(0.1)
    outs = {}
    for name, t in (("gather", t_gather), ("ring", t_ring)):
        db = device_batch(t._host_batch(batch, train=True), t.mesh)
        # the step donates its state argument — reassign so t stays usable
        t.state, metrics, _ = t._train_steps[True](t.state, db, rng, ratio)
        outs[name] = {k: float(v) for k, v in metrics.items()}
    for k, want in outs["gather"].items():
        assert outs["ring"][k] == pytest.approx(want, rel=1e-4, abs=1e-5), (
            k, outs,
        )

    assert np.isfinite(t_ring.train())


def test_mbtrain_ring_flagship_no_full_size_activations(tmp_path):
    """Done-criterion for the flagship 100k-bag claim (VERDICT r4 item 3):
    the compiled per-device HLO of the FULL ring train step (four-optimizer
    GAN phase, modularity included) contains ZERO tensors with the full
    token dimension at a bag (3600) well beyond what the gather layout
    materializes, and peak temp memory is a fraction of the gather
    layout's."""
    import re

    import jax
    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer
    from imp_tpu.engine.trainer import device_batch

    root = str(tmp_path / "ringdata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)

    def compiled(sp_attention, out):
        t = build_trainer(
            _flagship_sp_cfg(
                tmp_path, root, out, sp_attention, bag_pad=3600, batch=2,
                mesh_shape=(2, 4),
            )
        )
        batch = next(iter(t.train_loader))
        db = device_batch(t._host_batch(batch, train=True), t.mesh)
        return t._train_steps[True].lower(
            t.state, db, jax.random.PRNGKey(0), jnp.float32(0.1)
        ).compile()

    ring_c = compiled("ring", "hlo_ring")
    gather_c = compiled("gather", "hlo_gather")
    full_dim = re.compile(r"[,\[ (]3600[,\]) ]")
    ring_hits = len(full_dim.findall(ring_c.as_text()))
    gather_hits = len(full_dim.findall(gather_c.as_text()))
    assert gather_hits > 0  # the detector sees the gather layout's N
    assert ring_hits == 0, (
        f"flagship ring step materialized {ring_hits} full-token-dim tensors"
    )
    ring_tmp = ring_c.memory_analysis().temp_size_in_bytes
    gather_tmp = gather_c.memory_analysis().temp_size_in_bytes
    # the full train step carries token-INdependent temp (head, GAN MLPs,
    # ~100-leaf optimizer update) that ring cannot shrink, and the unrolled
    # ring hops (the XLA:CPU rendezvous workaround in parallel/sequence.py)
    # each hold their own chunk buffers, so the whole-step ratio floors
    # near 0.6 at this bag (measured 41.6 vs 69.5 MB); the bag-dependent
    # share itself vanishes — the ring_hits == 0 assert above is the
    # structural guarantee, this one only bounds regressions
    assert ring_tmp < 0.65 * gather_tmp, (ring_tmp, gather_tmp)


def test_umeml_gan_plot_similarity_under_sp(tmp_path):
    """The umeml_gan_plot similarity grids survive the sp layout (VERDICT
    r4 weak #5): the sowing pass runs under shard_map, one sim_<patient>.png
    per test sample — no silent early-return."""
    pytest.importorskip("matplotlib")
    import glob
    import os.path as osp

    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer

    root = str(tmp_path / "spplotdata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)
    cfg = _flagship_sp_cfg(tmp_path, root, "spplot", "ring")
    cfg.MODEL.NAME = "umeml_gan_plot"
    t = build_trainer(cfg)
    assert t.sp_axis == "seq"
    assert np.isfinite(t.train())
    pngs = glob.glob(osp.join(cfg.OUTPUT_DIR, "plots", "sim_*.png"))
    assert len(pngs) == len(t.test_loader.dataset)


def test_sp_translayer_matches_exact_single_device(mesh):
    """TransLayer with a seq axis (query-banded exact attention, VERDICT r2
    item 6): deterministic value AND parameter gradient vs the single-device
    exact (flash/dense) TransLayer on identical params — incl. the res-conv
    band slicing and mask padding."""
    from imp_tpu.ops.attention import TransLayer

    b, n, dim = 2, 300, 64  # n NOT divisible by sp=4 -> exercises band pad
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    valid = jnp.asarray(np.arange(n)[None, :] < np.array([[200], [300]]))

    single = TransLayer(dim=dim, impl="flash")
    sp_layer = TransLayer(dim=dim, seq_axis="seq")
    params = single.init(
        {"params": jax.random.PRNGKey(0)}, x, mask=valid, deterministic=True
    )

    def f_single(p, x):
        out = single.apply(p, x, mask=valid, deterministic=True)
        return jnp.sum(out * jnp.cos(out))

    def f_sp(p, x):
        fn = jax.shard_map(
            lambda p, x, m: sp_layer.apply(p, x, mask=m, deterministic=True),
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(),
        )
        out = fn(p, x, valid)
        return jnp.sum(out * jnp.cos(out))

    want = float(jax.jit(f_single)(params, x))
    got = float(jax.jit(f_sp)(params, x))
    assert got == pytest.approx(want, rel=1e-5)

    g_want = jax.jit(jax.grad(f_single))(params, x)
    g_got = jax.jit(jax.grad(f_sp))(params, x)
    for gw, gg in zip(
        jax.tree_util.tree_leaves(g_want), jax.tree_util.tree_leaves(g_got)
    ):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-5)


def test_transmil_sequence_parallel_end_to_end(tmp_path):
    """TransMIL trains with TPU.MESH_AXES=("data","seq") (VERDICT r2 item 6
    done-criterion): PPEG runs on the gathered grid, TransLayers band-
    parallelize the attention; eval matches the single-axis flash-attention
    trainer, and a training epoch runs to a finite loss."""
    from imp_tpu.config import get_cfg_default
    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer

    root = str(tmp_path / "tmildata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)

    def _cfg(out, axes, shape, attention):
        cfg = get_cfg_default()
        cfg.OUTPUT_DIR = str(tmp_path / out)
        cfg.SEED = 1
        cfg.DATASET.ROOT = root
        cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
        cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
        cfg.DATASET.FOLD = 1
        cfg.DATASET.BAG_PAD = 64
        cfg.DATASET.PATH.DIM = 32
        cfg.TASK.NAME = "Survival"
        cfg.TASK.LOSS = "nllsurvloss"
        cfg.TEST.EVALUATOR = "Survival"
        cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
        cfg.DATALOADER.TEST.BATCH_SIZE = 4
        cfg.OPTIM.MAX_EPOCH = 1
        cfg.TRAINER.NAME = "TransMIL"
        cfg.TPU.MESH_AXES = axes
        cfg.TPU.MESH_SHAPE = shape
        cfg.TPU.ATTENTION = attention
        cfg.TPU.PREFETCH = 0
        return cfg

    from imp_tpu.ops.attention import set_default_attention_impl

    try:
        t_sp = build_trainer(_cfg("tm_sp", ("data", "seq"), (4, 2), "auto"))
        assert t_sp.sp_axis == "seq"
        # single-device comparison runs the exact kernel too (a seq axis
        # always uses exact attention; Nyström doesn't decompose over shards)
        t_dp = build_trainer(_cfg("tm_dp", ("data",), (-1,), "flash"))

        r_sp = t_sp.test()
        r_dp = t_dp.test()
        assert r_sp == pytest.approx(r_dp, abs=1e-6)

        result = t_sp.train()
        assert np.isfinite(result)
    finally:
        set_default_attention_impl("nystrom")  # process-global default back


def test_ring_self_attention_matches_single_device(mesh):
    """Ring self-attention (O(N/sp) memory, ppermute K/V rotation): value
    and q/k/v gradients equal the single-device exact attention — incl. a
    sample whose valid length leaves later ring chunks fully masked (the
    −1e30 partial-lse merge path)."""
    from imp_tpu.parallel.sequence import ring_self_attention
    from imp_tpu.ops.flash_attention import flash_attention

    b, h, n, d = 2, 4, 512, 32
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    # sample 0: only 100 of 512 tokens valid -> shards 2-4 (nl=128) are
    # fully masked chunks for it
    valid = jnp.asarray(np.arange(n)[None, :] < np.array([[100], [512]]))

    def single(q, k, v):
        out = flash_attention(q, k, v, mask=valid)
        return jnp.sum(out * jnp.cos(out))

    def ring(q, k, v):
        fn = jax.shard_map(
            lambda q, k, v, m: ring_self_attention(
                q, k, v, m, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
            out_specs=P(None, None, "seq", None),
        )
        out = fn(q, k, v, valid)
        return jnp.sum(out * jnp.cos(out))

    want = float(jax.jit(single)(q, k, v))
    got = float(jax.jit(ring)(q, k, v))
    assert got == pytest.approx(want, rel=1e-5)

    g_want = jax.jit(jax.grad(single, argnums=(0, 1, 2)))(q, k, v)
    g_got = jax.jit(jax.grad(ring, argnums=(0, 1, 2)))(q, k, v)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-4, atol=1e-5)


def test_flash_partial_merge_matches_full():
    """flash_attention_partial chunks merged by logsumexp == one-shot
    attention, and partial_bwd with global (lse, delta) sums to the exact
    gradient — the single-process contract the ring builds on."""
    from imp_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_partial,
        flash_attention_partial_bwd,
    )

    b, h, n, d, nc = 2, 2, 256, 16, 4
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32) * d**-0.5
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    valid = jnp.asarray(np.arange(n)[None, :] < np.array([[70], [256]]))

    outs, lses = zip(*(
        flash_attention_partial(
            q, k[:, :, i::nc], v[:, :, i::nc], valid[:, i::nc]
        )
        for i in range(nc)
    ))
    lse = jnp.asarray(lses)  # [nc, B, H, N]
    lse_all = jax.scipy.special.logsumexp(lse, axis=0)
    out = sum(
        o * jnp.exp(l - lse_all)[..., None] for o, l in zip(outs, lse)
    )
    want = flash_attention(q, k, v, mask=valid, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6
    )

    def f(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, mask=valid, scale=1.0)))

    gq_w, gk_w, gv_w = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    do = jnp.cos(want)
    delta = jnp.sum(do * out, axis=-1)
    parts = [
        flash_attention_partial_bwd(
            q, k[:, :, i::nc], v[:, :, i::nc], valid[:, i::nc],
            do, lse_all, delta,
        )
        for i in range(nc)
    ]
    gq = sum(p[0] for p in parts)
    gk = jnp.zeros_like(gk_w).at[:, :, 0::nc].set(parts[0][1])
    gv = jnp.zeros_like(gv_w).at[:, :, 0::nc].set(parts[0][2])
    for i in range(1, nc):
        gk = gk.at[:, :, i::nc].set(parts[i][1])
        gv = gv.at[:, :, i::nc].set(parts[i][2])
    for got_g, want_g in ((gq, gq_w), (gk, gk_w), (gv, gv_w)):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), rtol=1e-4, atol=1e-5
        )


def test_ring_translayer_shard_io_matches_single_device(mesh):
    """TPU.SP_ATTENTION=ring at the TransLayer level (VERDICT r3 item 4):
    shard-in/shard-out — the layer consumes and returns the [B, N/sp, D]
    token band (cls threaded separately as a replicated row), K/V rotate
    via ppermute and the residual conv runs with halo exchanges.  Value AND
    parameter gradients match the single-device exact TransLayer."""
    from imp_tpu.ops.attention import TransLayer

    b, n, dim = 2, 256, 64
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    cls = jnp.asarray(rng.normal(size=(b, 1, dim)), jnp.float32)
    valid = jnp.asarray(np.arange(n)[None, :] < np.array([[150], [256]]))

    single = TransLayer(dim=dim, impl="flash")
    x_full = jnp.concatenate([cls, x], axis=1)
    m_full = jnp.concatenate([jnp.ones((b, 1), bool), valid], axis=1)
    params = single.init(
        {"params": jax.random.PRNGKey(0)}, x_full, mask=m_full,
        deterministic=True,
    )

    ring_layer = TransLayer(dim=dim, seq_axis="seq", sp_mode="ring")

    def ring_fn(p, xb, mb, c):
        band, cl = ring_layer.apply(p, xb, mask=mb, deterministic=True,
                                    cls=c)
        me = jax.lax.axis_index("seq")
        cl = jax.lax.psum(jnp.where(me == 0, cl, jnp.zeros_like(cl)), "seq")
        return band, cl

    sharded = jax.jit(jax.shard_map(
        ring_fn, mesh=mesh,
        in_specs=(P(), P(None, "seq", None), P(None, "seq"), P()),
        out_specs=(P(None, "seq", None), P()),
    ))
    want = single.apply(params, x_full, mask=m_full, deterministic=True)
    got_band, got_cls = sharded(params, x, valid, cls)
    np.testing.assert_allclose(np.asarray(got_band), np.asarray(want[:, 1:]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want[:, :1]),
                               rtol=1e-4, atol=1e-5)

    def loss_single(p):
        o = single.apply(p, x_full, mask=m_full, deterministic=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ring(p):
        band, cl = jax.shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(), P(None, "seq", None), P(None, "seq"), P()),
            out_specs=(P(None, "seq", None), P()),
        )(p, x, valid, cls)
        o = jnp.concatenate([cl, band], axis=1)
        return jnp.sum(o * jnp.cos(o))

    assert float(jax.jit(loss_ring)(params)) == pytest.approx(
        float(jax.jit(loss_single)(params)), rel=1e-5
    )
    g_w = jax.jit(jax.grad(loss_single))(params)
    g_g = jax.jit(jax.grad(loss_ring))(params)
    for gw, gg in zip(jax.tree_util.tree_leaves(g_w),
                      jax.tree_util.tree_leaves(g_g)):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-5)


def test_transmil_ring_module_parity_and_no_full_size_activations(mesh):
    """TransMIL_MODULE sp_mode='ring' (VERDICT r3 item 4 done-criterion):

    1. eval-forward parity vs the single-device module on IDENTICAL params
       (checkpoints interchange — same names/shapes), and
    2. **no [B, N, D] unsharded intermediate exists**: the compiled
       per-device HLO contains ZERO tensors with the full token dimension
       (3600/3601 — the gather layout has hundreds), and peak temp memory
       is a fraction of the gather layout's."""
    import re

    import imp_tpu.ops.attention as A
    from imp_tpu.models.mil import TransMIL_MODULE

    b, fd = 2, 32
    rng = np.random.default_rng(33)

    A.set_default_attention_impl("flash")
    try:
        # -- parity at small N (side 8, sp=2 on a (4,2) mesh) --------------
        mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                     ("data", "seq"))
        N = 64
        xp = jnp.asarray(rng.normal(size=(b, N, fd)), jnp.float32)
        vp = jnp.asarray(np.arange(N)[None, :] < np.array([[40], [64]]))
        single = TransMIL_MODULE(path_input_dim=fd)
        ringm = TransMIL_MODULE(path_input_dim=fd, seq_axis="seq",
                                sp_mode="ring")
        params = single.init({"params": jax.random.PRNGKey(0)}, xp,
                             valid=vp, deterministic=True)
        want = single.apply(params, xp, valid=vp, deterministic=True)
        got = jax.jit(jax.shard_map(
            lambda p, xb, vb: ringm.apply(p, xb, valid=vb,
                                          deterministic=True),
            mesh=mesh2,
            in_specs=(P(), P(None, "seq", None), P(None, "seq")),
            out_specs=P(),
        ))(params, xp, vp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

        # -- memory: N=3600 (side 60, sp=4), ring vs gather ----------------
        N = 3600
        xp = jnp.asarray(rng.normal(size=(b, N, fd)), jnp.float32)
        vp = jnp.asarray(np.arange(N)[None, :] < np.array([[2000], [3600]]))
        gatherm = TransMIL_MODULE(path_input_dim=fd, seq_axis="seq",
                                  sp_mode="gather")

        def compiled(m):
            return jax.jit(jax.shard_map(
                lambda p, xb, vb: m.apply(p, xb, valid=vb,
                                          deterministic=True),
                mesh=mesh,
                in_specs=(P(), P(None, "seq", None), P(None, "seq")),
                out_specs=P(),
            )).lower(params, xp, vp).compile()

        ring_c, gather_c = compiled(ringm), compiled(gatherm)
        full_dim = re.compile(r"[,\[ (]360[01][,\]) ]")
        ring_hits = len(full_dim.findall(ring_c.as_text()))
        gather_hits = len(full_dim.findall(gather_c.as_text()))
        assert gather_hits > 0  # the detector sees the gather layout's N
        assert ring_hits == 0, (
            f"ring layout materialized {ring_hits} full-token-dim tensors"
        )
        ring_tmp = ring_c.memory_analysis().temp_size_in_bytes
        gather_tmp = gather_c.memory_analysis().temp_size_in_bytes
        assert ring_tmp < 0.5 * gather_tmp, (ring_tmp, gather_tmp)
    finally:
        A.set_default_attention_impl("nystrom")


def test_transmil_ring_trainer_end_to_end(tmp_path):
    """TransMIL trains under TPU.MESH_AXES=("data","seq") with
    TPU.SP_ATTENTION=ring: bag activations stay [N/sp] per device through
    the whole module; eval matches the single-device flash trainer and a
    training epoch reaches a finite metric."""
    from imp_tpu.config import get_cfg_default
    from imp_tpu.data import synthetic
    from imp_tpu.engine import build_trainer
    from imp_tpu.ops.attention import set_default_attention_impl

    root = str(tmp_path / "ringdata")
    synthetic.materialize(root, num_slides=16, bag_min=16, bag_max=48,
                          feat_dim=32, num_genes=120, group_size=15, seed=0)

    def _cfg(out, axes, shape, attention, sp_attention):
        cfg = get_cfg_default()
        cfg.OUTPUT_DIR = str(tmp_path / out)
        cfg.SEED = 1
        cfg.DATASET.ROOT = root
        cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
        cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
        cfg.DATASET.FOLD = 1
        cfg.DATASET.BAG_PAD = 64  # 8x8 grid; sp=2 -> 4 rows/device
        cfg.DATASET.PATH.DIM = 32
        cfg.TASK.NAME = "Survival"
        cfg.TASK.LOSS = "nllsurvloss"
        cfg.TEST.EVALUATOR = "Survival"
        cfg.DATALOADER.TRAIN.BATCH_SIZE = 4
        cfg.DATALOADER.TEST.BATCH_SIZE = 4
        cfg.OPTIM.MAX_EPOCH = 1
        cfg.TRAINER.NAME = "TransMIL"
        cfg.TPU.MESH_AXES = axes
        cfg.TPU.MESH_SHAPE = shape
        cfg.TPU.ATTENTION = attention
        cfg.TPU.SP_ATTENTION = sp_attention
        cfg.TPU.PREFETCH = 0
        return cfg

    try:
        t_ring = build_trainer(
            _cfg("tm_ring", ("data", "seq"), (4, 2), "auto", "ring"))
        assert t_ring.sp_axis == "seq"
        t_dp = build_trainer(
            _cfg("tm_dp1", ("data",), (-1,), "flash", "gather"))

        r_ring = t_ring.test()
        r_dp = t_dp.test()
        assert r_ring == pytest.approx(r_dp, abs=1e-6)

        result = t_ring.train()
        assert np.isfinite(result)
    finally:
        set_default_attention_impl("nystrom")


def test_sp_self_attention_matches_dense(mesh):
    """Sequence-sharded exact self-attention (all-gather-KV over the flash
    kernel; dense fallback on CPU) — value and gradient vs single-device."""
    from imp_tpu.parallel.sequence import self_attention_tokens_sp
    from imp_tpu.ops.flash_attention import flash_attention

    b, h, n, d = 2, 4, 512, 32
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    valid = jnp.asarray(np.arange(n)[None, :] < np.array([[300], [512]]))

    def single(q, k, v):
        out = flash_attention(q, k, v, mask=valid)
        return jnp.sum(out * jnp.cos(out))

    def sp(q, k, v):
        fn = jax.shard_map(
            lambda q, k, v, m: self_attention_tokens_sp(
                q, k, v, m, axis_name="seq"
            ),
            mesh=mesh,
            in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
            out_specs=P(None, None, "seq", None),
        )
        out = fn(q, k, v, valid)
        return jnp.sum(out * jnp.cos(out))

    want = float(jax.jit(single)(q, k, v))
    got = float(jax.jit(sp)(q, k, v))
    assert got == pytest.approx(want, rel=1e-5)

    g_want = jax.jit(jax.grad(single, argnums=(0, 1, 2)))(q, k, v)
    g_got = jax.jit(jax.grad(sp, argnums=(0, 1, 2)))(q, k, v)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-4, atol=1e-5)
