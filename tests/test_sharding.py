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


def test_bricked_mesh_step_matches_single_device():
    """The (tiles x depth-segments) sharded bricked step must produce the same
    updated grid as the single-device step given the same inputs: segment
    compositing is associative and exact, and gradient psums assemble (not
    duplicate) the per-segment cotangents."""
    import numpy as np
    import optax

    from thr3ed_atom_tpu.models.voxels import VoxelSize, create_voxel_grid
    from thr3ed_atom_tpu.modules.bricked_trainer import (
        bricked_train_step,
        bricked_train_step_mesh,
        make_bricked_train_statics,
    )
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.utils.camera import pose_spherical

    GRID, IMG = 17, 48  # 16 slabs -> 4 groups -> model_parallel=2 x 2 groups each
    grid = create_voxel_grid(
        jax.random.PRNGKey(0),
        grid_dims=(GRID, GRID, GRID),
        num_features=3,
        voxel_size=VoxelSize(*(3.0 / GRID,) * 3),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=10.0,
    )
    rng = np.random.default_rng(0)
    poses_np = np.stack(
        [
            np.hstack([p.rotation, p.translation])
            for p in (pose_spherical(a, -30.0, 4.0) for a in (15.0, 200.0))
        ]
    ).astype(np.float32)
    images = jnp.asarray(rng.random((2, IMG, IMG, 3), dtype=np.float32))
    poses = jnp.asarray(poses_np)
    axis, flip = dominant_axis_for_pose(poses_np[0][:, :3])
    statics = make_bricked_train_statics(
        grid, axis, flip, image_height=IMG, image_width=IMG, focal=IMG * 1.1,
        ray_batch_size=8 * 256, white_bkgd=True, interpret=True,
        # exit_eps must be 0 for exact single-vs-sharded parity: depth segments
        # cannot early-exit independently
        exit_eps=0.0,
    )
    # SGD, not Adam: Adam's first step is ~sign(g) * lr (scale-invariant), which
    # would HIDE gradient-duplication bugs in the psum layout; with SGD the grid
    # delta is exactly -lr * grad, so segment double-counting shows up as 2x.
    tx = optax.sgd(0.1)
    key = jax.random.PRNGKey(3)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731

    g_single, _, m_single = bricked_train_step(
        statics, tx, copy(grid), tx.init(grid), images, poses, jnp.int32(0), key
    )
    g_mesh, _, m_mesh = bricked_train_step_mesh(
        statics, tx, (4, 2), copy(grid), tx.init(grid), images, poses,
        jnp.int32(0), key,
    )
    # segment-rebased ray features round differently at ~1e-4 cells through the
    # bf16 tents; gradient-proportional deltas must agree well inside 2x
    for a, b in ((g_mesh.densities, g_single.densities),
                 (g_mesh.features, g_single.features)):
        delta_mesh = np.asarray(a) - np.asarray(grid.densities if a is g_mesh.densities else grid.features)
        delta_single = np.asarray(b) - np.asarray(grid.densities if a is g_mesh.densities else grid.features)
        scale = np.abs(delta_single).max() + 1e-12
        np.testing.assert_allclose(delta_mesh, delta_single, atol=0.02 * scale)
    assert float(m_mesh["total_loss"]) == pytest.approx(
        float(m_single["total_loss"]), rel=1e-3
    )


def test_bricked_mesh_segment_local_early_exit_within_tolerance():
    """Round-5: the mesh step runs segment-LOCAL early exit at bst.exit_eps
    (a segment exiting when its OWN transmittance saturates is conservative-
    correct: total T <= T_local, so the truncated tail is bounded by eps like
    the single-device rule). The eps-on mesh step must stay within the eps
    error budget of the eps-off mesh step on a DENSE scene where exits
    actually fire."""
    import numpy as np
    import optax

    from thr3ed_atom_tpu.models.voxels import VoxelSize, create_voxel_grid
    from thr3ed_atom_tpu.modules.bricked_trainer import (
        bricked_train_step_mesh,
        make_bricked_train_statics,
    )
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.utils.camera import pose_spherical

    GRID, IMG = 17, 48
    grid = create_voxel_grid(
        jax.random.PRNGKey(0),
        grid_dims=(GRID, GRID, GRID),
        num_features=3,
        voxel_size=VoxelSize(*(3.0 / GRID,) * 3),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=10.0,
    )
    # dense: push densities up so transmittance saturates mid-grid
    import dataclasses

    grid = dataclasses.replace(
        grid, densities=jnp.abs(grid.densities) * 5.0 + 4.0
    )
    rng = np.random.default_rng(0)
    poses_np = np.stack(
        [
            np.hstack([p.rotation, p.translation])
            for p in (pose_spherical(a, -30.0, 4.0) for a in (15.0, 200.0))
        ]
    ).astype(np.float32)
    images = jnp.asarray(rng.random((2, IMG, IMG, 3), dtype=np.float32))
    poses = jnp.asarray(poses_np)
    axis, flip = dominant_axis_for_pose(poses_np[0][:, :3])
    tx = optax.sgd(0.1)
    key = jax.random.PRNGKey(3)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731

    outs = {}
    for eps in (0.0, 1e-4):
        statics = make_bricked_train_statics(
            grid, axis, flip, image_height=IMG, image_width=IMG,
            focal=IMG * 1.1, ray_batch_size=8 * 256, white_bkgd=True,
            interpret=True, exit_eps=eps,
        )
        outs[eps] = bricked_train_step_mesh(
            statics, tx, (4, 2), copy(grid), tx.init(grid), images, poses,
            jnp.int32(0), key,
        )
    g_off, _, m_off = outs[0.0]
    g_on, _, m_on = outs[1e-4]
    assert float(m_on["total_loss"]) == pytest.approx(
        float(m_off["total_loss"]), rel=1e-3
    )
    for a, b in ((g_on.densities, g_off.densities),
                 (g_on.features, g_off.features)):
        scale = float(np.abs(np.asarray(b) - np.asarray(grid.densities if b is g_off.densities else grid.features)).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0.05 * scale
        )
