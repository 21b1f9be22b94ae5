"""Native C concordance kernel: builds with the system compiler and matches
the numpy implementation exactly."""

import numpy as np
import pytest

from imp_tpu.evaluation.survival_metrics import _weighted_concordance
from imp_tpu.native import native_weighted_concordance


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n = 500
    time = rng.integers(1, 60, n).astype(float)
    event = rng.random(n) < 0.6
    est = rng.normal(size=n)
    w = np.where(event, rng.uniform(0.5, 4.0, n), 0.0)
    return event, time, est, w


def test_native_builds_and_matches_numpy(data):
    event, time, est, w = data
    native = native_weighted_concordance(event, time, est, w)
    assert native is not None, "C toolchain present in this image; build must work"
    want = _weighted_concordance(event, time, est, w)
    assert native[0] == pytest.approx(want[0], rel=1e-12)
    assert native[1:] == want[1:]


def test_native_used_for_large_cohorts(monkeypatch):
    import imp_tpu.evaluation.survival_metrics as sm

    rng = np.random.default_rng(1)
    n = 3000  # above _NATIVE_THRESHOLD
    time = rng.integers(1, 500, n).astype(float)
    event = rng.random(n) < 0.6
    est = rng.normal(size=n)
    got = sm.concordance_index_censored(event, time, est)
    # cross-check against the numpy path on a subsample-free direct call
    monkeypatch.setattr(sm, "_NATIVE_THRESHOLD", 10**12)
    want = sm.concordance_index_censored(event, time, est)
    assert got[0] == pytest.approx(want[0], rel=1e-12)
    assert got[1:] == want[1:]
