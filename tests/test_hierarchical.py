"""Hierarchical importance sampling: sample_pdf correctness + the coarse-to-fine
procedure matching uniform sampling quality at half the sample budget."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.rendering.fast_renderer import render_sh_voxel_grid_fast
from thr3ed_atom_tpu.rendering.hierarchical import (
    render_sh_voxel_grid_hierarchical,
    sample_pdf,
)
from thr3ed_atom_tpu.rendering.renderer import (
    SHVoxGridRenderConfig,
    render_sh_voxel_grid,
)
from thr3ed_atom_tpu.utils.camera import CameraBounds

from tests.test_fast_renderer import _rays, _scene


def test_sample_pdf_concentrates_on_heavy_bins(key):
    bins = jnp.broadcast_to(jnp.linspace(0.0, 10.0, 11), (4, 11))
    weights = jnp.zeros((4, 10)).at[:, 3].set(100.0)  # all mass in bin [3, 4]
    samples = sample_pdf(key, bins, weights, 64)
    frac_inside = float(jnp.mean((samples >= 3.0) & (samples <= 4.0)))
    assert frac_inside > 0.95
    assert samples.shape == (4, 64)


def test_sample_pdf_uniform_weights_spread(key):
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 17), (2, 17))
    weights = jnp.ones((2, 16))
    samples = sample_pdf(key, bins, weights, 512)
    assert float(samples.min()) >= 2.0 and float(samples.max()) <= 6.0
    # roughly uniform: mean near the midpoint
    assert abs(float(samples.mean()) - 4.0) < 0.2


def test_sample_pdf_deterministic_mode():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (1, 9))
    weights = jnp.ones((1, 8))
    a = sample_pdf(None, bins, weights, 16, deterministic=True)
    b = sample_pdf(None, bins, weights, 16, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.diff(np.asarray(a)[0]) >= 0).all()  # monotone


def test_hierarchical_beats_uniform_with_wide_bounds():
    """The regime importance sampling is for: the object occupies a small fraction of
    the sampled depth range. At a 64-sample budget, coarse+fine must land markedly
    closer to a 512-uniform-sample reference than 64 uniform samples do (measured:
    ~2.6x lower error)."""
    grid = _scene()
    rays = _rays(17)
    exact_config = SHVoxGridRenderConfig(
        num_samples_per_ray=512,
        camera_bounds=CameraBounds(0.2, 20.0),  # wide: scene spans ~15% of the range
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=64,
    )
    reference = render_sh_voxel_grid(grid, rays, exact_config, None)

    budget_config = exact_config.replace(num_samples_per_ray=64)
    hier = render_sh_voxel_grid_hierarchical(grid, rays, budget_config, None)
    uniform = render_sh_voxel_grid_fast(grid, rays, budget_config, None)

    err_hier = float(jnp.mean(jnp.abs(hier.colour - reference.colour)))
    err_uniform = float(jnp.mean(jnp.abs(uniform.colour - reference.colour)))
    assert err_hier < 0.01, f"hierarchical too far from reference: {err_hier}"
    assert err_hier < err_uniform * 0.6, (
        f"hierarchical ({err_hier}) should clearly beat uniform ({err_uniform})"
    )
    assert np.isfinite(np.asarray(hier.colour)).all()
    assert np.isfinite(np.asarray(hier.extra["disparity"])).all()


def test_hierarchical_perturbed_and_jitted(key):
    grid = _scene()
    rays = _rays(9)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=64,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=True,
        optimized_sampling=True,
        white_bkgd=True,
        fast_topk=32,
    )
    out = jax.jit(
        lambda g, r, k: render_sh_voxel_grid_hierarchical(g, r, config, k)
    )(grid, rays, key)
    assert np.isfinite(np.asarray(out.colour)).all()


def test_hierarchical_gradients_flow(key):
    grid = _scene(num_features=3)
    rays = _rays(7)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=16,
    )

    def loss(g):
        out = render_sh_voxel_grid_hierarchical(g, rays, config, None)
        return jnp.mean((out.colour - 0.3) ** 2)

    grads = jax.grad(loss)(grid)
    assert float(jnp.abs(grads.densities).sum()) > 0.0
    assert float(jnp.abs(grads.features).sum()) > 0.0
    assert np.isfinite(np.asarray(grads.densities)).all()
