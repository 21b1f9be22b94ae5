"""Golden-value parity tests: our jnp losses vs the reference torch code
executed as a black-box oracle, plus survival-metric correctness tests."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from reference_shim import load_ref_losses, load_ref_ops_utils

from imp_tpu.losses import (
    nll_loss,
    nll_loss_new,
    ce_surv_loss,
    cox_loss,
    kd_loss,
    cca_loss,
)
from imp_tpu.evaluation import (
    concordance_index_censored,
    concordance_index_ipcw,
    censoring_survival_function,
)
from imp_tpu.ops import compute_modularity


@pytest.fixture(scope="module")
def ref_loss():
    return load_ref_losses()


@pytest.fixture(scope="module")
def surv_batch():
    rng = np.random.default_rng(0)
    B, K = 6, 4
    logits = rng.normal(size=(B, K)).astype(np.float32)
    Y = rng.integers(0, K, size=B)
    c = rng.integers(0, 2, size=B)
    return logits, Y, c


def test_nll_loss_new_matches_reference(ref_loss, surv_batch):
    logits, Y, c = surv_batch
    want = ref_loss.nll_loss_new(
        (torch.tensor(logits),), torch.tensor(Y), torch.tensor(c), alpha=0.0
    ).item()
    got = float(nll_loss_new(jnp.asarray(logits), jnp.asarray(Y), jnp.asarray(c)))
    assert got == pytest.approx(want, rel=1e-5)
    # sum reduction too
    want_s = ref_loss.nll_loss_new(
        (torch.tensor(logits),), torch.tensor(Y), torch.tensor(c), alpha=0.3,
        reduction="sum",
    ).item()
    got_s = float(
        nll_loss_new(jnp.asarray(logits), jnp.asarray(Y), jnp.asarray(c), alpha=0.3, reduction="sum")
    )
    assert got_s == pytest.approx(want_s, rel=1e-5)


def test_nll_loss_matches_reference(ref_loss, surv_batch):
    logits, Y, c = surv_batch
    hazards = 1 / (1 + np.exp(-logits))
    want = ref_loss.nll_loss(
        torch.tensor(hazards), None, torch.tensor(Y), torch.tensor(c), alpha=0.4
    ).item()
    got = float(
        nll_loss(jnp.asarray(hazards), None, jnp.asarray(Y), jnp.asarray(c), alpha=0.4)
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_ce_surv_loss_matches_reference(ref_loss, surv_batch):
    logits, Y, c = surv_batch
    hazards = 1 / (1 + np.exp(-logits))
    want = ref_loss.ce_loss(
        torch.tensor(hazards), None, torch.tensor(Y), torch.tensor(c), alpha=0.4
    ).item()
    got = float(
        ce_surv_loss(jnp.asarray(hazards), None, jnp.asarray(Y), jnp.asarray(c), alpha=0.4)
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_cox_loss_matches_reference_formula(surv_batch):
    logits, Y, c = surv_batch
    theta = logits[:, 0]
    times = np.asarray(Y, np.float64)  # reference passes survival values as S
    R = (times[None, :] >= times[:, None]).astype(np.float64)
    want = -np.mean(
        (theta - np.log((np.exp(theta)[None, :] * R).sum(1))) * (1 - c)
    )
    got = float(cox_loss(jnp.asarray(theta), jnp.asarray(times), jnp.asarray(c)))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_kd_loss_matches_torch():
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    s = rng.normal(size=(4, 6)).astype(np.float32)
    t = rng.normal(size=(4, 6)).astype(np.float32)
    T = 5.0
    want = (
        F.kl_div(
            F.log_softmax(torch.tensor(s) / T, dim=1),
            F.softmax(torch.tensor(t) / T, dim=1),
            reduction="batchmean",
        )
        * (T * T)
    ).item()
    got = float(kd_loss(jnp.asarray(s), jnp.asarray(t), T=T))
    assert got == pytest.approx(want, rel=1e-5)


def test_cca_loss_matches_torch_svd():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(32, 12)).astype(np.float32)
    Y = (X @ rng.normal(size=(12, 12)).astype(np.float32)) + 0.1 * rng.normal(
        size=(32, 12)
    ).astype(np.float32)
    tX, tY = torch.tensor(X), torch.tensor(Y)
    Xc = tX - tX.mean(0)
    Yc = tY - tY.mean(0)
    Xs = Xc / Xc.std(0, unbiased=False)
    Ys = Yc / Yc.std(0, unbiased=False)
    C = Xs.T @ Ys / (tX.size(0) - 1)
    _, s, _ = torch.svd(C)
    want = (1 / (s.sum() / s.numel() + 1e-8)).item()
    got = float(cca_loss(jnp.asarray(X), jnp.asarray(Y)))
    assert got == pytest.approx(want, rel=1e-3)


def test_cca_loss_gradient_matches_torch_svd():
    """The CCA epoch optimizes grad(cca_loss) wrt the accumulated
    (h_path, h_omic) activations (ref ``trainer.py:672-739``) — assert the
    jax gradient matches torch autograd through the SVD on fixed inputs."""
    import jax

    rng = np.random.default_rng(7)
    X = rng.normal(size=(24, 10)).astype(np.float32)
    Y = (X @ rng.normal(size=(10, 10)).astype(np.float32)) + 0.3 * rng.normal(
        size=(24, 10)
    ).astype(np.float32)

    tX = torch.tensor(X, requires_grad=True)
    tY = torch.tensor(Y, requires_grad=True)
    Xc = tX - tX.mean(0)
    Yc = tY - tY.mean(0)
    Xs = Xc / Xc.std(0, unbiased=False)
    Ys = Yc / Yc.std(0, unbiased=False)
    C = Xs.T @ Ys / (tX.size(0) - 1)
    _, s, _ = torch.svd(C)
    (1 / (s.sum() / s.numel() + 1e-8)).backward()

    gx, gy = jax.grad(
        lambda a, b: cca_loss(a, b), argnums=(0, 1)
    )(jnp.asarray(X), jnp.asarray(Y))
    np.testing.assert_allclose(
        np.asarray(gx), tX.grad.numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(gy), tY.grad.numpy(), rtol=2e-3, atol=2e-5
    )


def test_modularity_matches_reference_torch():
    ref_ops = load_ref_ops_utils()
    rng = np.random.default_rng(3)
    c = rng.normal(size=(1, 5, 16)).astype(np.float32)
    x = rng.normal(size=(1, 20, 16)).astype(np.float32)
    want = ref_ops.compute_modularity(
        torch.tensor(c), torch.tensor(x), grid=False
    ).item()
    got = float(compute_modularity(jnp.asarray(c), jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-4)


# --------------------------- survival metrics -------------------------------


def _sksurv_style_cindex(event, time, estimate, tied_tol=1e-8):
    """Independent transcription of the sksurv group-based algorithm."""
    event = np.asarray(event, bool)
    time = np.asarray(time, float)
    estimate = np.asarray(estimate, float)
    n = len(time)
    order = np.argsort(time, kind="mergesort")
    numerator = denominator = 0.0
    i = 0
    while i < n - 1:
        time_i = time[order[i]]
        end = i + 1
        while end < n and time[order[end]] == time_i:
            end += 1
        censored_same = ~event[order[i:end]]
        for j in range(i, end):
            if event[order[j]]:
                mask = np.zeros(n, bool)
                mask[end:] = True
                mask[i:end] = censored_same
                est_i = estimate[order[j]]
                est = estimate[order[mask]]
                ties = np.abs(est - est_i) <= tied_tol
                con = (est < est_i) & ~ties
                numerator += con.sum() + 0.5 * ties.sum()
                denominator += mask.sum()
        i = end
    return numerator / denominator


def test_cindex_matches_group_algorithm():
    rng = np.random.default_rng(4)
    n = 60
    time = rng.integers(1, 30, size=n).astype(float)
    event = rng.random(n) < 0.7
    est = rng.normal(size=n) + 0.05 * (30 - time)  # mildly informative
    got = concordance_index_censored(event, time, est)[0]
    want = _sksurv_style_cindex(event, time, est)
    assert got == pytest.approx(want, rel=1e-12)


def test_cindex_hand_example():
    # times: 1(event), 2(censored), 3(event); risk must be decreasing in time
    event = np.array([True, False, True])
    time = np.array([1.0, 2.0, 3.0])
    est = np.array([3.0, 2.0, 1.0])  # perfectly concordant
    # comparable pairs: (0,1), (0,2) — sample 1 is censored so it is never
    # an index case, and sample 2 has no later samples
    c, con, dis, tr, tt = concordance_index_censored(event, time, est)
    assert c == 1.0 and con == 2 and dis == 0
    est_bad = np.array([1.0, 2.0, 3.0])  # perfectly discordant
    assert concordance_index_censored(event, time, est_bad)[0] == 0.0


def test_ipcw_equals_harrell_without_censoring():
    rng = np.random.default_rng(5)
    n = 40
    time = rng.integers(1, 50, size=n).astype(float) + rng.random(n)
    event = np.ones(n, bool)
    est = rng.normal(size=n)
    train = (event, time)
    harrell = concordance_index_censored(event, time, est)[0]
    uno = concordance_index_ipcw(train, (event, time), est)[0]
    assert uno == pytest.approx(harrell, rel=1e-12)


def test_censoring_km_hand_case():
    # times 1,2,3,4; censored at 2 and 4 (event=False)
    event = np.array([True, False, True, False])
    time = np.array([1.0, 2.0, 3.0, 4.0])
    uniq, prob = censoring_survival_function(event, time)
    # censoring KM: at t=1 (event only) G=1; at t=2 one censor among 3 at risk
    # -> G=2/3; at t=3 (event) G=2/3; at t=4 one censor among 1 -> G=0
    np.testing.assert_allclose(uniq, [1, 2, 3, 4])
    np.testing.assert_allclose(prob, [1.0, 2 / 3, 2 / 3, 0.0])


def test_ipcw_weighted_case_hand():
    # simple: train == test, events at t=1,3 with censor at 2
    event = np.array([True, False, True])
    time = np.array([1.0, 2.0, 3.0])
    est = np.array([3.0, 2.0, 1.0])
    # G(1)=1 (no censoring before/at 1); G(3)=1/2 (censor at 2 among 2 at risk)
    # weights: w1=1, w3=4. pairs: (1->2),(1->3) w=1 each; none for 3 (no later)
    # all concordant -> cindex=1
    c = concordance_index_ipcw((event, time), (event, time), est)[0]
    assert c == 1.0


def test_kl_cosine_orthogonal_match_reference(ref_loss):
    """The defined-but-unused reference losses (loss.py:195-221)."""
    from imp_tpu.losses import kl_loss, cosine_loss, orthogonal_loss

    rng = np.random.default_rng(3)
    y = rng.normal(size=(5, 7)).astype(np.float32)
    y_hat = rng.normal(size=(5, 7)).astype(np.float32)

    want = ref_loss.KLLoss()(torch.tensor(y), torch.tensor(y_hat)).item()
    got = float(kl_loss(jnp.asarray(y), jnp.asarray(y_hat)))
    assert got == pytest.approx(want, rel=1e-4)

    want_c = ref_loss.CosineLoss()(torch.tensor(y), torch.tensor(y_hat)).numpy()
    got_c = np.asarray(cosine_loss(jnp.asarray(y), jnp.asarray(y_hat)))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-5)

    P, P_hat, G, G_hat = (
        rng.normal(size=(5, 7)).astype(np.float32) for _ in range(4)
    )
    want_o = (
        ref_loss.OrthogonalLoss(gamma=0.5)(
            torch.tensor(P), torch.tensor(P_hat), torch.tensor(G), torch.tensor(G_hat)
        )
        .detach()
        .numpy()
    )
    got_o = np.asarray(
        orthogonal_loss(
            jnp.asarray(P), jnp.asarray(P_hat), jnp.asarray(G), jnp.asarray(G_hat)
        )
    )
    np.testing.assert_allclose(got_o, want_o, rtol=1e-4, atol=1e-5)
