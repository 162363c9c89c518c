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


def test_matches_official_lpips_semantics_torch_oracle(metric):
    """Pin the JAX implementation against an independent torch reimplementation
    of the official LPIPS forward (lpips/lpips.py: ScalingLayer -> vgg16 slices
    tapping relu{1_2,2_2,3_3,4_3,5_3} -> normalize_tensor -> 1x1 linear heads
    -> spatial average -> layer sum), run with IDENTICAL weights. This
    guarantees that, given the official weight tensors (convert via
    tools/convert_lpips_weights.py offline), our scores equal the official
    package's — the only unverifiable residue in this egress-less deployment is
    the weight values themselves."""
    import torch
    import torch.nn.functional as F

    w = {k: np.asarray(v) for k, v in metric.weights.items()}

    def official_forward(img_a, img_b):
        # images [H, W, 3] in [0, 1] -> official input domain [-1, 1], NCHW
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def to_t(img):
            t = torch.from_numpy(img).permute(2, 0, 1)[None] * 2.0 - 1.0
            return (t - shift) / scale

        cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512)
        taps_after = {1, 3, 6, 9, 12}

        def vgg_taps(x):
            taps = []
            conv_i = 0
            for item in cfg:
                if item == "M":
                    x = F.max_pool2d(x, 2, 2)
                    continue
                kern = torch.from_numpy(
                    w[f"conv{conv_i}_w"].transpose(3, 2, 0, 1).copy()
                )  # HWIO -> OIHW
                bias = torch.from_numpy(w[f"conv{conv_i}_b"])
                x = F.relu(F.conv2d(x, kern, bias, padding=1))
                if conv_i in taps_after:
                    taps.append(x)
                conv_i += 1
            return taps

        def normalize_tensor(t, eps=1e-10):
            norm = torch.sqrt(torch.sum(t**2, dim=1, keepdim=True))
            return t / (norm + eps)

        with torch.no_grad():
            ta = vgg_taps(to_t(img_a))
            tb = vgg_taps(to_t(img_b))
            total = 0.0
            for i, (fa, fb) in enumerate(zip(ta, tb)):
                diff = (normalize_tensor(fa) - normalize_tensor(fb)) ** 2
                lin = torch.from_numpy(w[f"lin{i}_w"]).view(1, -1, 1, 1)
                total += (diff * lin).sum(dim=1, keepdim=True).mean(dim=(2, 3))
        return float(total)

    for seed in (11, 2):
        a, b = _pair(seed=seed)
        ours = metric(a, b)
        oracle = official_forward(a, b)
        assert ours == pytest.approx(oracle, rel=1e-4), (seed, ours, oracle)


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
