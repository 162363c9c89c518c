"""Render-core tests: ray casting geometry, samplers, AABB intersection, accumulator
closed forms, and processor masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.models.voxels import AxisAlignedBoundingBox, VoxelGrid, VoxelSize
from thr3ed_atom_tpu.rendering.accumulate import (
    accumulate_radiance_density_on_rays,
    density2occupancy_pb,
)
from thr3ed_atom_tpu.rendering.interface import (
    ProcessedPointsOnRays,
    Rays,
    SampledPointsOnRays,
)
from thr3ed_atom_tpu.rendering.process import process_points_with_sh_voxel_grid
from thr3ed_atom_tpu.rendering.rays import (
    cast_rays,
    cast_rays_batch,
    flatten_rays,
    sample_random_rays_and_pixels_synchronously,
)
from thr3ed_atom_tpu.rendering.sample import (
    ray_aabb_intersection,
    sample_aabb_bound_uniform_points_on_rays,
    sample_uniform_points_on_rays,
)
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical
from thr3ed_atom_tpu.utils.constants import EXTRA_ACCUMULATED_WEIGHTS


# ------------------------------------------------------------------ ray casting


def test_cast_rays_identity_pose_geometry():
    intr = CameraIntrinsics(4, 4, 2.0)
    pose_rot = np.eye(3, dtype=np.float32)
    pose_trans = np.array([[1.0], [2.0], [3.0]], dtype=np.float32)
    from thr3ed_atom_tpu.utils.camera import CameraPose

    rays = cast_rays(intr, CameraPose(pose_rot, pose_trans))
    assert rays.origins.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(rays.origins[0, 0]), [1.0, 2.0, 3.0])

    # pixel (row 0, col 0): x = 0.5 - 2 = -1.5 over focal 2; y = -(0.5 - 2)/2
    np.testing.assert_allclose(
        np.asarray(rays.directions[0, 0]), [-0.75, 0.75, -1.0], atol=1e-6
    )
    # principal direction at image center is -z: dirs average to [0, 0, -1]
    mean_dir = np.asarray(rays.directions).mean(axis=(0, 1))
    np.testing.assert_allclose(mean_dir, [0.0, 0.0, -1.0], atol=1e-6)


def test_cast_rays_orbit_pose_points_at_origin():
    intr = CameraIntrinsics(11, 11, 20.0)
    pose = pose_spherical(123.0, -45.0, 4.0)
    rays = cast_rays(intr, pose)
    # central ray must pass (approximately) through the world origin
    center = np.asarray(rays.directions[5, 5])
    origin = np.asarray(rays.origins[5, 5])
    # find t minimizing ||o + t d||: t* = -o.d/||d||^2; residual ~ 0
    t_star = -np.dot(origin, center) / np.dot(center, center)
    residual = np.linalg.norm(origin + t_star * center)
    assert residual < 0.15  # central pixel is half a pixel off the exact axis


def test_cast_rays_batch_matches_single():
    intr = CameraIntrinsics(6, 7, 9.0)
    poses = []
    for yaw in (0.0, 90.0):
        p = pose_spherical(yaw, -30.0, 4.0)
        poses.append(np.hstack([p.rotation, p.translation]))
    batch = cast_rays_batch(intr, jnp.asarray(np.stack(poses)))
    single = cast_rays(
        intr, pose_spherical(90.0, -30.0, 4.0)
    )
    np.testing.assert_allclose(
        np.asarray(batch.directions[1]), np.asarray(single.directions), atol=1e-6
    )


# ------------------------------------------------------------------ samplers


def test_uniform_sampler_unperturbed_linspace():
    rays = Rays(origins=jnp.zeros((3, 3)), directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1)))
    out = sample_uniform_points_on_rays(
        rays, CameraBounds(2.0, 6.0), num_samples=5, perturb=False
    )
    np.testing.assert_allclose(
        np.asarray(out.depths[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6
    )
    # points = o + d * z
    np.testing.assert_allclose(np.asarray(out.points[0, :, 2]), [2, 3, 4, 5, 6], atol=1e-6)


def test_uniform_sampler_disparity_spacing():
    rays = Rays(origins=jnp.zeros((1, 3)), directions=jnp.array([[0.0, 0.0, 1.0]]))
    out = sample_uniform_points_on_rays(
        rays, CameraBounds(1.0, 4.0), num_samples=3, perturb=False,
        linear_disparity_sampling=True,
    )
    # disparity-uniform: 1/z linear from 1 to 0.25 -> z = [1, 1.6, 4]
    np.testing.assert_allclose(np.asarray(out.depths[0]), [1.0, 1.6, 4.0], atol=1e-5)


def test_uniform_sampler_perturbed_within_intervals(key):
    rays = Rays(origins=jnp.zeros((8, 3)), directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1)))
    out = sample_uniform_points_on_rays(
        rays, CameraBounds(2.0, 6.0), num_samples=16, key=key, perturb=True
    )
    depths = np.asarray(out.depths)
    assert (depths >= 2.0 - 1e-5).all() and (depths <= 6.0 + 1e-5).all()
    assert (np.diff(depths, axis=-1) > -1e-5).all()  # monotone along each ray
    # stratified: not all equal to the unperturbed linspace
    unperturbed = np.linspace(2.0, 6.0, 16)
    assert not np.allclose(depths[0], unperturbed)


def test_ray_aabb_intersection_hit_and_miss():
    aabb = AxisAlignedBoundingBox((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    rays = Rays(
        origins=jnp.array([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0], [0.0, 0.0, 5.0]]),
        directions=jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]),
    )
    bounds, intersecting = ray_aabb_intersection(rays, CameraBounds(2.0, 10.0), aabb)
    flags = np.asarray(intersecting).ravel()
    np.testing.assert_array_equal(flags, [True, False, False])
    # hit ray: enters at z=1 (t=4), exits z=-1 (t=6)
    np.testing.assert_allclose(np.asarray(bounds[0]), [4.0, 6.0], rtol=1e-4)
    # missed rays fall back to scene bounds
    np.testing.assert_allclose(np.asarray(bounds[1]), [2.0, 10.0], atol=1e-6)


def test_ray_aabb_intersection_clips_behind_camera():
    aabb = AxisAlignedBoundingBox((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    # camera inside the box: entry t is negative -> clipped to 0
    rays = Rays(origins=jnp.array([[0.0, 0.0, 0.0]]), directions=jnp.array([[0.0, 0.0, -1.0]]))
    bounds, intersecting = ray_aabb_intersection(rays, CameraBounds(0.1, 10.0), aabb)
    assert bool(np.asarray(intersecting).ravel()[0])
    np.testing.assert_allclose(np.asarray(bounds[0]), [0.0, 1.0], atol=1e-5)


def test_aabb_bound_sampler_concentrates_samples():
    aabb = AxisAlignedBoundingBox((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0))
    rays = Rays(origins=jnp.array([[0.0, 0.0, 5.0]]), directions=jnp.array([[0.0, 0.0, -1.0]]))
    out = sample_aabb_bound_uniform_points_on_rays(
        rays, CameraBounds(2.0, 10.0), num_samples=8, aabb=aabb, perturb=False
    )
    depths = np.asarray(out.depths[0])
    assert depths.min() == pytest.approx(4.0, abs=1e-4)
    assert depths.max() == pytest.approx(6.0, abs=1e-4)


# ------------------------------------------------------------------ accumulator


def test_accumulator_single_opaque_sample():
    """One fully opaque sample: colour = sigmoid(radiance), depth = its z."""
    radiance = jnp.full((1, 1, 3), 100.0)  # sigmoid -> 1
    density = jnp.full((1, 1, 1), 1e8)  # alpha -> 1 with INFINITY tail delta
    points = jnp.concatenate([radiance, density], axis=-1)
    processed = ProcessedPointsOnRays(points, jnp.full((1, 1), 3.0))
    rays = Rays(origins=jnp.zeros((1, 3)), directions=jnp.array([[0.0, 0.0, 1.0]]))
    out = accumulate_radiance_density_on_rays(
        processed, rays, white_bkgd=False
    )
    np.testing.assert_allclose(np.asarray(out.colour), [[1.0, 1.0, 1.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), [[3.0]], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS]), [[1.0]], atol=1e-5
    )


def test_accumulator_matches_bruteforce_transmittance():
    """Weights equal alpha_i * prod_{j<i}(1 - alpha_j) computed by brute force."""
    rng = np.random.default_rng(11)
    num_rays, num_samples = 4, 16
    radiance = rng.standard_normal((num_rays, num_samples, 3)).astype(np.float32)
    density = np.abs(rng.standard_normal((num_rays, num_samples, 1))).astype(np.float32)
    depths = np.sort(rng.uniform(1, 5, (num_rays, num_samples)).astype(np.float32), -1)
    dirs = rng.standard_normal((num_rays, 3)).astype(np.float32)

    processed = ProcessedPointsOnRays(
        jnp.asarray(np.concatenate([radiance, density], -1)), jnp.asarray(depths)
    )
    rays = Rays(origins=jnp.zeros((num_rays, 3)), directions=jnp.asarray(dirs))
    out = accumulate_radiance_density_on_rays(processed, rays, white_bkgd=True)

    # brute force in numpy
    deltas = np.concatenate(
        [np.diff(depths, axis=-1), np.full((num_rays, 1), 1e10, np.float32)], -1
    ) * np.linalg.norm(dirs, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-density[..., 0] * deltas)
    weights = np.zeros_like(alpha)
    for r in range(num_rays):
        transmittance = 1.0
        for s in range(num_samples):
            weights[r, s] = alpha[r, s] * transmittance
            transmittance *= 1.0 - alpha[r, s]
    colour = 1.0 / (1.0 + np.exp(-radiance))
    expected = (colour * weights[..., None]).sum(-2)
    acc = weights.sum(-1, keepdims=True)
    expected = expected + (1 - acc)

    np.testing.assert_allclose(np.asarray(out.colour), expected, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS]), acc, atol=1e-4
    )


def test_density2occupancy_pb_range():
    densities = jnp.array([0.0, 0.5, 100.0])
    deltas = jnp.array([1.0, 1.0, 1.0])
    alpha = np.asarray(density2occupancy_pb(densities, deltas))
    assert alpha[0] == 0.0
    assert 0.0 < alpha[1] < 1.0
    assert alpha[2] == pytest.approx(1.0)


# ------------------------------------------------------------------ processor


def test_processor_masks_outside_aabb(key):
    grid = VoxelGrid(
        densities=jnp.ones((4, 4, 4, 1)),
        features=jnp.ones((4, 4, 4, 3)),
        voxel_size=VoxelSize(0.5, 0.5, 0.5),  # AABB [-1, 1]^3
    )
    # one ray whose first sample is inside, second far outside
    points = jnp.array([[[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]]])
    sampled = SampledPointsOnRays(points, jnp.array([[1.0, 2.0]]))
    rays = Rays(origins=jnp.zeros((1, 3)), directions=jnp.array([[0.0, 0.0, 1.0]]))
    out = process_points_with_sh_voxel_grid(sampled, rays, grid)
    vals = np.asarray(out.points)
    assert vals.shape == (1, 2, 4)
    assert vals[0, 1, -1] == 0.0  # outside density zeroed
    assert vals[0, 1, 0] <= -1e9  # outside radiance -> -INFINITY
    assert vals[0, 0, -1] > 0.0  # inside density survives


def test_sample_random_rays_and_pixels(key):
    n = 100
    rays = Rays(
        origins=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
        directions=jnp.ones((n, 3)),
    )
    pixels = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    sampled_rays, sampled_pixels = sample_random_rays_and_pixels_synchronously(
        key, rays, pixels, 32
    )
    assert len(sampled_rays) == 32
    # synchronized: origins match pixels row-for-row
    np.testing.assert_array_equal(
        np.asarray(sampled_rays.origins), np.asarray(sampled_pixels)
    )
    # no duplicates (sampling without replacement)
    ids = np.asarray(sampled_pixels)[:, 0]
    assert len(np.unique(ids)) == 32


def test_flatten_rays():
    rays = Rays(origins=jnp.zeros((4, 5, 3)), directions=jnp.ones((4, 5, 3)))
    flat = flatten_rays(rays)
    assert flat.origins.shape == (20, 3)
