"""SH evaluation tests: Monte-Carlo orthonormality (independent oracle) + ladder shape
checks + golden values at canonical directions."""
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.ops.sh import C0, C1, evaluate_spherical_harmonics


def _basis_matrix(dirs: np.ndarray, degree: int) -> np.ndarray:
    """[N, K] matrix of SH basis values by evaluating with one-hot coefficients."""
    num_coeffs = (degree + 1) ** 2
    n = dirs.shape[0]
    out = np.zeros((n, num_coeffs), dtype=np.float64)
    for k in range(num_coeffs):
        coeffs = np.zeros((n, 1, num_coeffs), dtype=np.float32)
        coeffs[:, 0, k] = 1.0
        vals = evaluate_spherical_harmonics(
            degree, jnp.asarray(coeffs), jnp.asarray(dirs.astype(np.float32))
        )
        out[:, k] = np.asarray(vals)[:, 0]
    return out


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_orthonormality_monte_carlo(degree):
    """Real SH are orthonormal over the sphere: E[Y_i * Y_j] * 4*pi = delta_ij."""
    rng = np.random.default_rng(123)
    dirs = rng.standard_normal((200_000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    basis = _basis_matrix(dirs, degree)
    gram = (basis.T @ basis) / basis.shape[0] * 4.0 * np.pi
    np.testing.assert_allclose(gram, np.eye(basis.shape[1]), atol=0.06)


def test_degree0_constant():
    dirs = jnp.asarray(np.random.default_rng(0).standard_normal((10, 3)), dtype=jnp.float32)
    coeffs = jnp.ones((10, 3, 1), dtype=jnp.float32) * 2.0
    out = evaluate_spherical_harmonics(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out), 2.0 * C0, atol=1e-6)


def test_degree1_golden_axis_directions():
    """At +z: only the l=1,m=0 band contributes C1 * z; x/y bands vanish."""
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    coeffs = np.zeros((1, 1, 4), dtype=np.float32)
    coeffs[0, 0, 2] = 1.0  # the z-aligned coefficient
    out = evaluate_spherical_harmonics(1, jnp.asarray(coeffs), dirs)
    np.testing.assert_allclose(np.asarray(out), [[C1]], atol=1e-6)

    coeffs = np.zeros((1, 1, 4), dtype=np.float32)
    coeffs[0, 0, 1] = 1.0  # y coefficient: -C1 * y == 0 at +z
    out = evaluate_spherical_harmonics(1, jnp.asarray(coeffs), dirs)
    np.testing.assert_allclose(np.asarray(out), [[0.0]], atol=1e-6)


def test_batch_shapes():
    rng = np.random.default_rng(7)
    coeffs = jnp.asarray(rng.standard_normal((5, 3, 9)).astype(np.float32))
    dirs = rng.standard_normal((5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = evaluate_spherical_harmonics(2, coeffs, jnp.asarray(dirs))
    assert out.shape == (5, 3)


def test_coeff_count_mismatch_raises():
    with pytest.raises(AssertionError):
        evaluate_spherical_harmonics(
            2, jnp.zeros((1, 3, 4)), jnp.asarray([[0.0, 0.0, 1.0]])
        )
