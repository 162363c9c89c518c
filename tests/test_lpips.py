"""Pure-JAX LPIPS: metric properties + golden value on a fixed image pair.

The deployment has no torchvision/lpips weights (zero egress), so the metric runs
with the documented seeded random-feature fallback; the golden value pins the
implementation (architecture, taps, normalization) against regressions, and the
loader test covers the converted-npz path with synthetic weights.
"""
import numpy as np
import pytest

from thr3ed_atom_tpu.utils.lpips import (
    LPIPSMetric,
    load_lpips_weights,
    lpips,
    random_lpips_weights,
)


@pytest.fixture(scope="module")
def metric():
    return LPIPSMetric()


def _pair(seed=0, size=64):
    rng = np.random.default_rng(seed)
    a = rng.random((size, size, 3), dtype=np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_identity_is_zero(metric):
    a, _ = _pair()
    assert metric(a, a) == pytest.approx(0.0, abs=1e-6)


def test_monotone_in_distortion(metric):
    rng = np.random.default_rng(3)
    a = rng.random((64, 64, 3), dtype=np.float32)
    scores = []
    for noise in (0.02, 0.1, 0.4):
        b = np.clip(a + rng.normal(0, noise, a.shape).astype(np.float32), 0, 1)
        scores.append(metric(a, b))
    assert scores[0] < scores[1] < scores[2]


def test_blur_scores_lower_than_shuffle(metric):
    """A blurred image must be perceptually closer than a pixel-shuffled one —
    the property pixel metrics (MSE) can get backwards."""
    rng = np.random.default_rng(4)
    a = np.zeros((64, 64, 3), np.float32)
    a[16:48, 16:48] = rng.random((32, 32, 3)).astype(np.float32)
    blurred = a.copy()
    blurred[1:] = 0.5 * (a[1:] + a[:-1])  # cheap vertical blur
    shuffled = a.reshape(-1, 3)[rng.permutation(64 * 64)].reshape(64, 64, 3)
    assert metric(a, blurred) < metric(a, shuffled)


# computed once on the CPU backend; tolerance covers backend float variation
GOLDEN = 0.0018250534776598215


def test_golden_value_fixed_pair(metric):
    """Pins the fallback metric end-to-end (weights seed, taps, normalization)."""
    a, b = _pair(seed=11)
    value = metric(a, b)
    assert not metric.calibrated and metric.name == "lpips_rand_vgg"
    assert value == pytest.approx(GOLDEN, rel=2e-3), value


def test_weights_loader_npz_path(tmp_path, metric):
    """The converted-npz path: same arrays round-trip through the loader and are
    marked calibrated."""
    arrays = random_lpips_weights(seed=7)
    arrays["calibrated"] = np.ones((), np.float32)
    path = tmp_path / "w.npz"
    np.savez(path, **arrays)
    weights, calibrated = load_lpips_weights(path)
    assert calibrated
    a, b = _pair(seed=2)
    v = float(np.mean(np.asarray(lpips(weights, a[None], b[None]))))
    assert np.isfinite(v) and v > 0


def test_batched_matches_single(metric):
    a1, b1 = _pair(seed=5)
    a2, b2 = _pair(seed=6)
    batch = np.mean(
        np.asarray(
            lpips(
                metric.weights,
                np.stack([a1, a2]),
                np.stack([b1, b2]),
            )
        )
    )
    single = 0.5 * (metric(a1, b1) + metric(a2, b2))
    assert batch == pytest.approx(single, rel=1e-5)
