"""Foundation tests: camera math, range remapping, metrics, grid-size planner."""
import numpy as np
import pytest

from thr3ed_atom_tpu.utils.camera import (
    CameraIntrinsics,
    adjust_dynamic_range,
    get_thre360_animation_poses,
    pose_spherical,
    scale_camera_intrinsics,
    to8b,
)
from thr3ed_atom_tpu.utils.constants import INFINITY
from thr3ed_atom_tpu.utils.metrics import mse2psnr
from thr3ed_atom_tpu.utils.misc import check_power_of_2, compute_thre3d_grid_sizes


def test_adjust_dynamic_range_affine():
    data = np.array([0.0, 0.5, 1.0], dtype=np.float32)
    out = adjust_dynamic_range(data, (0.0, 1.0), (-1.0, 1.0))
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0], atol=1e-6)


def test_adjust_dynamic_range_clips_without_slack():
    data = np.array([-2.0, 2.0], dtype=np.float32)
    out = adjust_dynamic_range(data, (0.0, 1.0), (0.0, 1.0))
    # same range -> no-op even outside
    np.testing.assert_allclose(out, [-2.0, 2.0])
    out = adjust_dynamic_range(data, (0.0, 1.0), (0.0, 2.0))
    np.testing.assert_allclose(out, [0.0, 2.0])


def test_adjust_dynamic_range_slack_no_clip():
    data = np.array([-0.5, 1.5], dtype=np.float32)
    out = adjust_dynamic_range(data, (0.0, 1.0), (-1.0, 1.0), slack=True)
    np.testing.assert_allclose(out, [-2.0, 2.0], atol=1e-6)


def test_to8b():
    x = np.array([-0.1, 0.0, 0.5, 1.0, 1.7])
    out = to8b(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [0, 0, 127, 255, 255])


def test_mse2psnr():
    assert mse2psnr(1.0) == pytest.approx(0.0)
    assert mse2psnr(0.01) == pytest.approx(20.0)
    assert mse2psnr(0.0) == INFINITY


def test_pose_spherical_radius_and_orthonormality():
    pose = pose_spherical(yaw=37.0, pitch=-42.0, radius=4.0)
    # camera sits at distance `radius` from origin
    assert np.linalg.norm(pose.translation) == pytest.approx(4.0, abs=1e-5)
    # rotation is orthonormal with det +1
    rot = pose.rotation
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-5)


def test_pose_spherical_zero_angles_looks_down_negative_z():
    pose = pose_spherical(yaw=0.0, pitch=0.0, radius=2.0)
    np.testing.assert_allclose(pose.translation.ravel(), [0.0, 0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pose.rotation, np.eye(3), atol=1e-6)


def test_thre360_poses_drop_last_for_loop():
    poses = get_thre360_animation_poses(4.0, -30.0, num_poses=10)
    assert len(poses) == 9
    for pose in poses:
        assert np.linalg.norm(pose.translation) == pytest.approx(4.0, abs=1e-5)


def test_scale_camera_intrinsics():
    ci = scale_camera_intrinsics(CameraIntrinsics(100, 200, 50.0), 0.5)
    assert ci == CameraIntrinsics(50, 100, 25.0)
    ci = scale_camera_intrinsics(CameraIntrinsics(101, 201, 50.0), 0.5)
    assert ci.height == 51 and ci.width == 101  # ceil behaviour


def test_compute_thre3d_grid_sizes():
    sizes = compute_thre3d_grid_sizes((256, 256, 256), num_stages=4, scale_factor=2.0)
    assert sizes == [(32, 32, 32), (64, 64, 64), (128, 128, 128), (256, 256, 256)]
    sizes = compute_thre3d_grid_sizes((100, 100, 100), num_stages=3, scale_factor=2.0)
    assert sizes == [(25, 25, 25), (50, 50, 50), (100, 100, 100)]


def test_check_power_of_2():
    assert check_power_of_2(64)
    assert not check_power_of_2(100)
    assert not check_power_of_2(0)


def test_batchify_chunked_map():
    from thr3ed_atom_tpu.utils.misc import batchify

    calls = []

    def processor(x):
        calls.append(len(x))
        return [v * 2 for v in x]

    def collate(chunks):
        return [v for chunk in chunks for v in chunk]

    out = batchify(processor, collate, chunk_size=4)(list(range(10)))
    assert out == [v * 2 for v in range(10)]
    assert calls == [4, 4, 2]

    # small inputs bypass chunking
    calls.clear()
    out = batchify(processor, collate, chunk_size=100)(list(range(5)))
    assert out == [0, 2, 4, 6, 8] and calls == [5]


def test_throughput_meter():
    import time as _time

    from thr3ed_atom_tpu.utils.profiling import ThroughputMeter

    meter = ThroughputMeter(window=10)
    assert meter.per_sec == 0.0
    meter.tick(100)
    _time.sleep(0.05)
    meter.tick(100)
    rate = meter.per_sec
    assert 500 < rate < 10000  # ~100 units / 0.05s


def test_profile_trace_noop():
    from thr3ed_atom_tpu.utils.profiling import profile_trace

    with profile_trace(None):
        pass  # no-op path must not require jax
