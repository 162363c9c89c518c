"""Multi-device tests on the 8-device virtual CPU mesh: the data-parallel train step must
run sharded and agree numerically with the unsharded step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelSize, create_voxel_grid
from thr3ed_atom_tpu.modules.trainer import TrainStepStatics, _train_step
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical


@pytest.fixture(scope="module")
def tiny_problem():
    G, S = 8, 24
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.stack(
            [
                np.hstack(pose_spherical(yaw, -30.0, 4.0))
                for yaw in (0.0, 90.0, 180.0, 270.0)
            ]
        ).astype(np.float32)
    )
    grid = create_voxel_grid(
        jax.random.PRNGKey(0),
        grid_dims=(G, G, G),
        num_features=3,
        voxel_size=VoxelSize(3 / G, 3 / G, 3 / G),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=10.0,
    )
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=S, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    intr = CameraIntrinsics(16, 16, 18.0)
    return grid, config, images, poses, intr


def _statics(config, intr, use_mesh):
    return TrainStepStatics(
        render_config=config,
        image_height=intr.height,
        image_width=intr.width,
        focal=intr.focal,
        ray_batch_size=256,
        apply_diffuse_render_regularization=True,
        use_mesh=use_mesh,
    )


def test_eight_devices_available():
    assert jax.device_count() >= 8, (
        "conftest must force 8 virtual CPU devices for sharding tests"
    )


def test_mesh_step_runs_and_matches_unsharded(tiny_problem):
    grid, config, images, poses, intr = tiny_problem
    tx = optax.adam(0.01)
    key = jax.random.PRNGKey(3)

    # the step donates grid/opt_state buffers; hand each call its own copy
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)  # noqa: E731
    grid_a, _, metrics_a = _train_step(
        _statics(config, intr, use_mesh=False), tx, copy(grid), tx.init(grid), images, poses, key
    )
    grid_b, _, metrics_b = _train_step(
        _statics(config, intr, use_mesh=True), tx, copy(grid), tx.init(grid), images, poses, key
    )

    # same key -> identical batch -> identical loss and update up to float reassociation
    assert float(metrics_a["total_loss"]) == pytest.approx(
        float(metrics_b["total_loss"]), rel=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(grid_a.densities), np.asarray(grid_b.densities), atol=1e-4
    )


def test_mesh_multi_step_training_descends(tiny_problem):
    grid, config, images, poses, intr = tiny_problem
    grid = jax.tree_util.tree_map(jnp.copy, grid)  # step donates its inputs
    statics = _statics(config, intr, use_mesh=True)
    tx = optax.adam(0.05)
    opt_state = tx.init(grid)
    key = jax.random.PRNGKey(4)

    losses = []
    for _ in range(20):
        key, sub = jax.random.split(key)
        grid, opt_state, metrics = _train_step(
            statics, tx, grid, opt_state, images, poses, sub
        )
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_model_parallel_grid_sharding_matches_unsharded(tiny_problem):
    """2-D (data x model) mesh: grid x-axis sharded across 'model'; numerics must
    match the unsharded step (XLA inserts halo exchange + psums)."""
    grid, config, images, poses, intr = tiny_problem
    tx = optax.adam(0.01)
    key = jax.random.PRNGKey(7)
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)  # noqa: E731

    base = TrainStepStatics(
        render_config=config, image_height=intr.height, image_width=intr.width,
        focal=intr.focal, ray_batch_size=256,
        apply_diffuse_render_regularization=False, use_mesh=False,
    )
    tp = TrainStepStatics(
        render_config=config, image_height=intr.height, image_width=intr.width,
        focal=intr.focal, ray_batch_size=256,
        apply_diffuse_render_regularization=False, use_mesh=True, model_parallel=2,
    )

    grid_a, _, metrics_a = _train_step(base, tx, copy(grid), tx.init(grid), images, poses, key)
    grid_b, _, metrics_b = _train_step(tp, tx, copy(grid), tx.init(grid), images, poses, key)

    assert float(metrics_a["total_loss"]) == pytest.approx(
        float(metrics_b["total_loss"]), rel=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(grid_a.features), np.asarray(grid_b.features), atol=1e-4
    )
