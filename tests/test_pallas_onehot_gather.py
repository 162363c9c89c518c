"""Pallas one-hot MXU gather kernel: numerics + custom VJP vs plain-XLA reference.

Runs in interpreter mode on the CPU test backend (pltpu interpret path); the same code
compiles natively on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from thr3ed_atom_tpu.ops.pallas.onehot_gather import (
    onehot_gather,
    weighted_onehot_gather,
)


def _reference(table, indices, weights):
    return jnp.einsum("nkc,nk->nc", jnp.take(table, indices, axis=0), weights)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("B,C,N,K", [(128, 128, 300, 8), (256, 128, 1024, 4), (128, 256, 64, 1)])
def test_forward_matches_reference(B, C, N, K):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (B, C), jnp.float32)
    indices = jax.random.randint(k2, (N, K), 0, B)
    weights = jax.random.normal(k3, (N, K), jnp.float32)

    out = weighted_onehot_gather(table, indices, weights)
    expected = _reference(table, indices, weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_plain_gather():
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (128, 128), jnp.float32)
    indices = jax.random.randint(key, (77,), 0, 128)
    out = onehot_gather(table, indices)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(table, indices, axis=0)), atol=1e-5
    )


def test_duplicate_indices_accumulate():
    """The same row referenced by several (n, k) slots sums its weights."""
    table = jnp.eye(128, dtype=jnp.float32)
    indices = jnp.array([[3, 3, 5, 3]])
    weights = jnp.array([[1.0, 2.0, 10.0, 4.0]])
    out = weighted_onehot_gather(table, indices, weights)
    assert float(out[0, 3]) == pytest.approx(7.0)
    assert float(out[0, 5]) == pytest.approx(10.0)


def test_custom_vjp_matches_reference_grads():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    B, C, N, K = 128, 128, 200, 8
    table = jax.random.normal(k1, (B, C), jnp.float32)
    indices = jax.random.randint(k2, (N, K), 0, B)
    weights = jax.random.normal(k3, (N, K), jnp.float32)

    def loss_pallas(t, w):
        return jnp.sum(weighted_onehot_gather(t, indices, w) ** 2)

    def loss_ref(t, w):
        return jnp.sum(_reference(t, indices, w) ** 2)

    gt_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(table, weights)
    gt_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(table, weights)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_r), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-4)
