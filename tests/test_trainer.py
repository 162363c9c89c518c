"""End-to-end training tests on a synthetic scene (CPU-runnable smoke config).

A ground-truth voxel grid renders the training images; a freshly initialized grid must
then reconstruct the scene to a sane PSNR within a few hundred steps. This replaces the
reference's dependence on downloaded NeRF-synthetic data (reference conftest.py:13-15).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelSize, create_voxel_grid
from thr3ed_atom_tpu.modules.trainer import TrainStepStatics, _train_step
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

IMAGE_SIZE = 48
FOCAL = IMAGE_SIZE * 1.1
NUM_IMAGES = 8
GRID = 12
TRAIN_SAMPLES = 48


def _ground_truth_scene():
    rng = np.random.default_rng(5)
    coords = (
        np.stack(np.meshgrid(*[np.arange(GRID)] * 3, indexing="ij"), -1) - (GRID - 1) / 2
    ) / GRID
    dist = np.linalg.norm(coords - np.array([0.05, -0.05, 0.0]), axis=-1)
    densities = np.where(dist < 0.3, 8.0, 0.0)[..., None].astype(np.float32)
    features = np.zeros((GRID, GRID, GRID, 3), dtype=np.float32)
    features[..., 0] = 3.0
    features[..., 1] = -1.0
    features[..., 2] = rng.uniform(-2, 0)
    from thr3ed_atom_tpu.models.voxels import VoxelGrid

    return VoxelGrid(
        densities=jnp.asarray(densities),
        features=jnp.asarray(features),
        voxel_size=VoxelSize(3.0 / GRID, 3.0 / GRID, 3.0 / GRID),
    )


@pytest.fixture(scope="module")
def synthetic_data():
    grid = _ground_truth_scene()
    intrinsics = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, FOCAL)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=96,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
    )
    vol_mod = VolumetricModel(grid, render_config=config)
    rng = np.random.default_rng(7)
    images, poses = [], []
    for _ in range(NUM_IMAGES):
        pose = pose_spherical(rng.uniform(0, 360), rng.uniform(-60, -20), 4.0)
        out = vol_mod.render(pose, intrinsics)
        images.append(np.asarray(out.colour))
        poses.append(np.hstack([pose.rotation, pose.translation]))
    return (
        jnp.asarray(np.stack(images)),
        jnp.asarray(np.stack(poses).astype(np.float32)),
        intrinsics,
    )


def _fresh_model():
    grid = create_voxel_grid(
        jax.random.PRNGKey(0),
        grid_dims=(GRID, GRID, GRID),
        num_features=3,
        voxel_size=VoxelSize(3.0 / GRID, 3.0 / GRID, 3.0 / GRID),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=10.0,
    )
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=TRAIN_SAMPLES,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
    )
    return grid, config


def test_train_step_improves_psnr(synthetic_data):
    images, poses, intrinsics = synthetic_data
    grid, render_config = _fresh_model()

    statics = TrainStepStatics(
        render_config=render_config,
        image_height=intrinsics.height,
        image_width=intrinsics.width,
        focal=intrinsics.focal,
        ray_batch_size=1024,
        apply_diffuse_render_regularization=True,
    )
    tx = optax.adam(0.05)
    key = jax.random.PRNGKey(1)

    # the step donates grid/opt_state; use copies so the fixture grid survives
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)  # noqa: E731
    key, sub = jax.random.split(key)
    _, _, first_metrics = _train_step(
        statics, tx, copy(grid), tx.init(grid), images, poses, sub
    )
    first_psnr = float(first_metrics["specular_psnr"])

    opt_state = tx.init(grid)
    grid = copy(grid)
    for _ in range(150):
        key, sub = jax.random.split(key)
        grid, opt_state, metrics = _train_step(
            statics, tx, grid, opt_state, images, poses, sub
        )
    final_psnr = float(metrics["specular_psnr"])

    assert np.isfinite(final_psnr)
    assert final_psnr > first_psnr + 5.0, (
        f"PSNR did not improve: {first_psnr:.2f} -> {final_psnr:.2f}"
    )
    assert final_psnr > 20.0, f"final PSNR too low: {final_psnr:.2f}"


def test_bricked_use_mesh_dispatches_mesh_step(tmp_path, synthetic_data, monkeypatch):
    """use_mesh=True with the bricked (default) procedure must actually run the
    sharded tiles x depth-segments step, not silently train single-device
    (round-2 advisor finding: trainer.py ignored use_mesh on the bricked path)."""
    import json

    import imageio.v2 as imageio

    import thr3ed_atom_tpu.modules.bricked_trainer as bt
    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.modules.trainer import (
        _bricked_mesh_shape,
        train_sh_vox_grid_vol_mod_with_posed_images,
    )
    from thr3ed_atom_tpu.utils.camera import to8b
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS,
        EXTRINSIC,
        FOCAL as FOCAL_KEY,
        HEIGHT,
        INTRINSIC,
        ROTATION,
        TRANSLATION,
        WIDTH,
    )

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")

    images, poses, intrinsics = synthetic_data
    img_dir = tmp_path / "train"
    img_dir.mkdir()
    params = {}
    for i in range(NUM_IMAGES):
        name = f"r_{i}.png"
        imageio.imwrite(img_dir / name, to8b(np.asarray(images[i])))
        pose = np.asarray(poses[i])
        params[name] = {
            INTRINSIC: {
                BOUNDS: [2.0, 6.0],
                HEIGHT: IMAGE_SIZE,
                WIDTH: IMAGE_SIZE,
                FOCAL_KEY: FOCAL,
            },
            EXTRINSIC: {
                ROTATION: pose[:, :3].tolist(),
                TRANSLATION: pose[:, 3:].tolist(),
            },
        }
    with open(tmp_path / "train_camera_params.json", "w") as f:
        json.dump(params, f)
    dataset = PosedImagesDataset(
        images_dir=img_dir,
        camera_params_json=tmp_path / "train_camera_params.json",
    )

    grid, render_config = _fresh_model()
    vol_mod = VolumetricModel(
        grid,
        render_config=render_config,
        render_procedure="render_sh_voxel_grid_bricked",
    )

    mesh_calls = []
    real_mesh_step = bt.bricked_train_step_mesh

    def counting_mesh_step(statics, tx, mesh_shape, *args, **kwargs):
        mesh_calls.append(mesh_shape)
        return real_mesh_step(statics, tx, mesh_shape, *args, **kwargs)

    monkeypatch.setattr(bt, "bricked_train_step_mesh", counting_mesh_step)

    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod,
        train_dataset=dataset,
        output_dir=tmp_path / "output",
        ray_batch_size=512,
        num_stages=1,
        num_iterations_per_stage=3,
        learning_rate=0.05,
        save_freq=1000,
        test_freq=1000,
        feedback_freq=1000,
        summary_freq=10,
        fast_debug_mode=True,
        verbose_rendering=False,
        use_mesh=True,
    )

    assert mesh_calls, "use_mesh=True never reached bricked_train_step_mesh"
    dp, mp = mesh_calls[0]
    assert dp * mp > 1, f"mesh shape {mesh_calls[0]} is single-device"
    assert np.isfinite(np.asarray(vol_mod.thre3d_repr.densities)).all()

    # shape picker sanity: the chosen shape always satisfies divisibility
    for num_tiles, n_dev, _expect_dp in ((8, 8, 8), (4, 8, 4), (3, 8, 1)):
        b = bt.make_bricked_train_statics(
            grid, 0, False, image_height=IMAGE_SIZE, image_width=IMAGE_SIZE,
            focal=FOCAL, ray_batch_size=num_tiles * 64, white_bkgd=True,
            interpret=True,
        )
        if b.num_tiles == num_tiles:
            dp, mp = _bricked_mesh_shape(b, n_dev, 1)
            assert b.num_tiles % dp == 0 and n_dev % mp == 0


def _write_posed_dataset(tmp_path, images, poses):
    """Write a PosedImagesDataset (images + camera-params JSON) to tmp_path."""
    import json

    import imageio.v2 as imageio

    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.utils.camera import to8b
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS,
        EXTRINSIC,
        FOCAL as FOCAL_KEY,
        HEIGHT,
        INTRINSIC,
        ROTATION,
        TRANSLATION,
        WIDTH,
    )

    img_dir = tmp_path / "train"
    img_dir.mkdir()
    params = {}
    for i in range(NUM_IMAGES):
        name = f"r_{i}.png"
        imageio.imwrite(img_dir / name, to8b(np.asarray(images[i])))
        pose = np.asarray(poses[i])
        params[name] = {
            INTRINSIC: {
                BOUNDS: [2.0, 6.0],
                HEIGHT: IMAGE_SIZE,
                WIDTH: IMAGE_SIZE,
                FOCAL_KEY: FOCAL,
            },
            EXTRINSIC: {
                ROTATION: pose[:, :3].tolist(),
                TRANSLATION: pose[:, 3:].tolist(),
            },
        }
    with open(tmp_path / "train_camera_params.json", "w") as f:
        json.dump(params, f)
    return PosedImagesDataset(
        images_dir=img_dir,
        camera_params_json=tmp_path / "train_camera_params.json",
    )


def test_gnomonic_procedure_trains_through_procedure(tmp_path, synthetic_data, monkeypatch):
    """The stagewise trainer dispatches whole-pose gnomonic train steps when the
    gnomonic procedure is selected (rendering/gnomonic_train.py)."""
    import thr3ed_atom_tpu.rendering.gnomonic_train as gtr
    from thr3ed_atom_tpu.modules.trainer import (
        train_sh_vox_grid_vol_mod_with_posed_images,
    )

    images, poses, intrinsics = synthetic_data
    dataset = _write_posed_dataset(tmp_path, images, poses)

    grid, render_config = _fresh_model()
    vol_mod = VolumetricModel(
        grid,
        render_config=render_config,
        render_procedure="render_sh_voxel_grid_gnomonic",
    )

    # the view-diversity floor (trainer._GN_MIN_POSES_PER_STEP) routes the
    # whole-pose loop through the k-pose accumulation step
    step_calls = []
    real_step = gtr.gnomonic_train_step_multi

    def counting_step(tstat, tx, grid_, opt_state_, imgs, *args, **kwargs):
        step_calls.append((tstat, imgs.shape[0]))
        return real_step(tstat, tx, grid_, opt_state_, imgs, *args, **kwargs)

    monkeypatch.setattr(gtr, "gnomonic_train_step_multi", counting_step)

    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod,
        train_dataset=dataset,
        output_dir=tmp_path / "output",
        ray_batch_size=512,
        num_stages=1,
        num_iterations_per_stage=3,
        learning_rate=0.05,
        save_freq=1000,
        test_freq=1000,
        feedback_freq=1000,
        summary_freq=10,
        fast_debug_mode=True,
        verbose_rendering=False,
    )

    assert len(step_calls) == 3, "gnomonic procedure did not drive the train loop"
    assert step_calls[0][0].height == IMAGE_SIZE
    # each step averaged at least the floored number of views
    assert step_calls[0][1] >= 4
    assert np.isfinite(np.asarray(vol_mod.thre3d_repr.densities)).all()
    final = tmp_path / "output" / "saved_models" / "model_final"
    assert final.with_suffix(".npz").exists()


def test_gnomonic_mesh_training_keeps_view_diversity_floor(
    tmp_path, synthetic_data, monkeypatch
):
    """A NARROW mesh (2 devices) must not drop per-step view diversity below
    _GN_MIN_POSES_PER_STEP: each device accumulates ceil(floor / n_dev) poses
    so the step still averages >= 4 distinct views (single-view whole-pose
    steps at the canonical lr measurably thrash the grid — round-4 canonical
    run, stage-3 heldout 44.9 -> 31.1 dB)."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")

    import thr3ed_atom_tpu.rendering.gnomonic_train as gtr
    from thr3ed_atom_tpu.modules.trainer import (
        _GN_MIN_POSES_PER_STEP,
        train_sh_vox_grid_vol_mod_with_posed_images,
    )

    images, poses, intrinsics = synthetic_data
    dataset = _write_posed_dataset(tmp_path, images, poses)
    grid, render_config = _fresh_model()
    vol_mod = VolumetricModel(
        grid,
        render_config=render_config,
        render_procedure="render_sh_voxel_grid_gnomonic",
    )

    mesh_calls = []
    real_step = gtr.gnomonic_train_step_mesh

    def counting_step(tstat, tx, n_dev, grid_, opt_state_, imgs, *a, **kw):
        mesh_calls.append((n_dev, imgs.shape[:2]))
        return real_step(tstat, tx, n_dev, grid_, opt_state_, imgs, *a, **kw)

    monkeypatch.setattr(gtr, "gnomonic_train_step_mesh", counting_step)

    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod,
        train_dataset=dataset,
        output_dir=tmp_path / "output",
        ray_batch_size=512,
        num_stages=1,
        num_iterations_per_stage=2,
        learning_rate=0.05,
        save_freq=1000,
        test_freq=1000,
        feedback_freq=1000,
        summary_freq=10,
        use_mesh=True,
        mesh_devices=2,
        fast_debug_mode=True,
        verbose_rendering=False,
    )

    assert len(mesh_calls) == 2, "mesh step did not drive the train loop"
    n_dev, (dev_axis, k) = mesh_calls[0]
    assert n_dev == 2 and dev_axis == 2
    assert n_dev * k >= _GN_MIN_POSES_PER_STEP, mesh_calls[0]
    assert np.isfinite(np.asarray(vol_mod.thre3d_repr.densities)).all()


def test_train_step_metrics_structure(synthetic_data):
    images, poses, intrinsics = synthetic_data
    grid, render_config = _fresh_model()
    statics = TrainStepStatics(
        render_config=render_config,
        image_height=intrinsics.height,
        image_width=intrinsics.width,
        focal=intrinsics.focal,
        ray_batch_size=256,
        apply_diffuse_render_regularization=False,
    )
    tx = optax.adam(0.01)
    new_grid, _, metrics = _train_step(
        statics,
        tx,
        jax.tree_util.tree_map(jnp.copy, grid),
        tx.init(grid),
        images,
        poses,
        jax.random.PRNGKey(2),
    )
    assert set(metrics) == {"specular_loss", "specular_psnr", "total_loss"}
    # parameters actually moved
    assert not np.allclose(np.asarray(new_grid.densities), np.asarray(grid.densities))


def test_full_training_procedure_smoke(tmp_path, synthetic_data):
    """The complete coarse-to-fine procedure end-to-end with a tiny config."""
    import json

    import imageio.v2 as imageio

    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.modules.trainer import (
        train_sh_vox_grid_vol_mod_with_posed_images,
    )
    from thr3ed_atom_tpu.modules.volumetric_model import (
        create_volumetric_model_from_saved_model,
    )
    from thr3ed_atom_tpu.utils.camera import to8b
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS,
        EXTRINSIC,
        FOCAL as FOCAL_KEY,
        HEIGHT,
        INTRINSIC,
        ROTATION,
        TRANSLATION,
        WIDTH,
    )

    images, poses, intrinsics = synthetic_data

    # write the dataset in the on-disk contract
    img_dir = tmp_path / "train"
    img_dir.mkdir()
    params = {}
    for i in range(NUM_IMAGES):
        name = f"r_{i}.png"
        imageio.imwrite(img_dir / name, to8b(np.asarray(images[i])))
        pose = np.asarray(poses[i])
        params[name] = {
            INTRINSIC: {
                BOUNDS: [2.0, 6.0],
                HEIGHT: IMAGE_SIZE,
                WIDTH: IMAGE_SIZE,
                FOCAL_KEY: FOCAL,
            },
            EXTRINSIC: {
                ROTATION: pose[:, :3].tolist(),
                TRANSLATION: pose[:, 3:].tolist(),
            },
        }
    with open(tmp_path / "train_camera_params.json", "w") as f:
        json.dump(params, f)

    dataset = PosedImagesDataset(
        images_dir=img_dir,
        camera_params_json=tmp_path / "train_camera_params.json",
    )

    grid, render_config = _fresh_model()
    vol_mod = VolumetricModel(grid, render_config=render_config)
    out_dir = tmp_path / "output"

    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod,
        train_dataset=dataset,
        output_dir=out_dir,
        ray_batch_size=512,
        num_stages=2,
        num_iterations_per_stage=30,
        scale_factor=2.0,
        learning_rate=0.05,
        lr_decay_steps_per_stage=20,
        save_freq=1000,
        test_freq=1000,
        feedback_freq=1000,
        summary_freq=10,
        fast_debug_mode=True,
        verbose_rendering=False,
    )

    # final checkpoint written and loadable
    final = out_dir / "saved_models" / "model_final"
    assert final.with_suffix(".npz").exists() and final.with_suffix(".json").exists()
    loaded, extra = create_volumetric_model_from_saved_model(final)
    assert loaded.thre3d_repr.grid_dims == (GRID, GRID, GRID)
    assert "hemispherical_radius" in extra
    np.testing.assert_allclose(
        np.asarray(loaded.thre3d_repr.densities),
        np.asarray(vol_mod.thre3d_repr.densities),
        atol=1e-6,
    )


def test_resume_from_checkpoint(tmp_path, synthetic_data):
    """Training resumes at the stage matching the checkpointed grid resolution."""
    import json

    import imageio.v2 as imageio

    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.modules.trainer import (
        train_sh_vox_grid_vol_mod_with_posed_images,
    )
    from thr3ed_atom_tpu.utils.camera import to8b
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS,
        EXTRINSIC,
        FOCAL as FOCAL_KEY,
        HEIGHT,
        INTRINSIC,
        ROTATION,
        TRANSLATION,
        WIDTH,
    )

    images, poses, intrinsics = synthetic_data
    img_dir = tmp_path / "train"
    img_dir.mkdir()
    params = {}
    for i in range(NUM_IMAGES):
        name = f"r_{i}.png"
        imageio.imwrite(img_dir / name, to8b(np.asarray(images[i])))
        pose = np.asarray(poses[i])
        params[name] = {
            INTRINSIC: {BOUNDS: [2.0, 6.0], HEIGHT: IMAGE_SIZE, WIDTH: IMAGE_SIZE,
                        FOCAL_KEY: FOCAL},
            EXTRINSIC: {ROTATION: pose[:, :3].tolist(), TRANSLATION: pose[:, 3:].tolist()},
        }
    with open(tmp_path / "train_camera_params.json", "w") as f:
        json.dump(params, f)
    dataset = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=tmp_path / "train_camera_params.json"
    )

    grid, render_config = _fresh_model()
    vol_mod = VolumetricModel(grid, render_config=render_config)
    out_dir = tmp_path / "o1"
    train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod, train_dataset=dataset, output_dir=out_dir,
        ray_batch_size=256, num_stages=2, num_iterations_per_stage=5,
        save_freq=1000, test_freq=1000, feedback_freq=1000, summary_freq=100,
        fast_debug_mode=True, verbose_rendering=False,
    )
    final = out_dir / "saved_models" / "model_final"

    # resume: the final grid is at the stage-2 resolution -> only stage 2 reruns
    grid2, _ = _fresh_model()
    vol_mod2 = VolumetricModel(grid2, render_config=render_config)
    out_dir2 = tmp_path / "o2"
    trained = train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod=vol_mod2, train_dataset=dataset, output_dir=out_dir2,
        ray_batch_size=256, num_stages=2, num_iterations_per_stage=5,
        save_freq=1000, test_freq=1000, feedback_freq=1000, summary_freq=100,
        fast_debug_mode=True, verbose_rendering=False, resume_from=final,
    )
    assert trained.thre3d_repr.grid_dims == (GRID, GRID, GRID)
    assert (out_dir2 / "saved_models" / "model_final.npz").exists()


def test_opt_state_path_accepts_both_spellings():
    """--resume_from is usually the model's .npz path while checkpoints are
    written from a suffix-less stem; both must resolve to the same _opt.npz
    (a mismatch silently resumed with a fresh Adam)."""
    from pathlib import Path

    from thr3ed_atom_tpu.modules.trainer import _opt_state_path

    stem = Path("/x/model_stage_2_iter_14000")
    assert _opt_state_path(stem) == Path("/x/model_stage_2_iter_14000_opt.npz")
    assert _opt_state_path(stem.with_suffix(".npz")) == _opt_state_path(stem)


def test_optimizer_state_checkpoint_roundtrip(tmp_path, synthetic_data):
    """Adam moments + schedule count survive the npz round-trip exactly: one more
    step from the restored state matches one more step from the live state."""
    import optax

    from thr3ed_atom_tpu.modules.trainer import (
        load_optimizer_state,
        save_optimizer_state,
    )

    images, poses, intrinsics = synthetic_data
    grid, render_config = _fresh_model()
    statics = TrainStepStatics(
        render_config=render_config,
        image_height=intrinsics.height,
        image_width=intrinsics.width,
        focal=intrinsics.focal,
        ray_batch_size=512,
        apply_diffuse_render_regularization=False,
    )
    tx = optax.adam(optax.exponential_decay(0.05, 100, 0.5, staircase=True))
    key = jax.random.PRNGKey(9)
    copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)  # noqa: E731

    opt_state = tx.init(grid)
    grid_live = copy(grid)
    for _ in range(20):
        key, sub = jax.random.split(key)
        grid_live, opt_state, _ = _train_step(
            statics, tx, grid_live, opt_state, images, poses, sub
        )

    ckpt = tmp_path / "ckpt"
    save_optimizer_state(ckpt, opt_state, stage=1, stage_iteration=20)
    restored = load_optimizer_state(ckpt, tx.init(grid))
    assert restored is not None
    opt_restored, saved_stage, saved_iter = restored
    assert (saved_stage, saved_iter) == (1, 20)

    key, sub = jax.random.split(key)
    g_a, _, m_a = _train_step(
        statics, tx, copy(grid_live), copy(opt_state), images, poses, sub
    )
    g_b, _, m_b = _train_step(
        statics, tx, copy(grid_live), opt_restored, images, poses, sub
    )
    np.testing.assert_allclose(
        np.asarray(g_a.densities), np.asarray(g_b.densities), atol=1e-7
    )
    assert float(m_a["total_loss"]) == pytest.approx(float(m_b["total_loss"]))

    # incompatible template (different grid shape) is rejected, not mis-loaded
    bigger = create_voxel_grid(
        jax.random.PRNGKey(1),
        grid_dims=(GRID * 2,) * 3,
        num_features=3,
        voxel_size=VoxelSize(*(3.0 / (GRID * 2),) * 3),
    )
    assert load_optimizer_state(ckpt, tx.init(bigger)) is None
