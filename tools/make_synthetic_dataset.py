"""Generate a synthetic posed-images dataset by rendering a procedural voxel scene.

This environment has no downloaded NeRF-synthetic data, so this tool produces a
self-contained dataset in the framework's on-disk format (images dir + per-image
camera-params JSON, same contract as the reference's data layer) for integration tests,
CLI smoke runs, and benchmarking. The scene is a cluster of coloured density blobs whose
ground-truth grid is also saved, so reconstruction quality has a known oracle.
"""
import json
import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize  # noqa: E402
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel  # noqa: E402
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig  # noqa: E402
from thr3ed_atom_tpu.utils.camera import (  # noqa: E402
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
    to8b,
)
from thr3ed_atom_tpu.utils.constants import (  # noqa: E402
    BOUNDS,
    EXTRINSIC,
    FOCAL,
    HEIGHT,
    INTRINSIC,
    ROTATION,
    TRANSLATION,
    WIDTH,
)
from thr3ed_atom_tpu.utils.logging import log  # noqa: E402

NEAR, FAR = 2.0, 6.0


def make_blob_scene(
    grid_size: int = 64, seed: int = 3, num_blobs: int = 6, converged: bool = False
) -> VoxelGrid:
    """A procedural scene: soft density blobs with random colours + mild view-dependence.

    ``converged=True`` makes the raw densities look like a TRAINED relu field's:
    empty space is pushed properly negative instead of carrying Gaussian tails
    (>0 everywhere), which is what the occupancy mip's exact-zero skip rule sees
    in real mid/late-stage training. Benchmarks use this so measured throughput
    reflects the converged-scene workload rather than an everywhere-occupied one."""
    rng = np.random.default_rng(seed)
    coords = (
        np.stack(np.meshgrid(*[np.arange(grid_size)] * 3, indexing="ij"), -1)
        - (grid_size - 1) / 2
    ) / grid_size  # [-0.5, 0.5]^3

    densities = np.zeros((grid_size,) * 3, dtype=np.float32)
    features = np.zeros((grid_size,) * 3 + (27,), dtype=np.float32)
    for _ in range(num_blobs):
        center = rng.uniform(-0.28, 0.28, size=3)
        radius = rng.uniform(0.08, 0.16)
        colour = rng.uniform(-3.0, 3.0, size=3)
        dist = np.linalg.norm(coords - center, axis=-1)
        blob = np.exp(-((dist / radius) ** 2) * 4.0).astype(np.float32)
        densities += 8.0 * blob
        for channel in range(3):
            features[..., channel * 9] += colour[channel] * blob
            # small degree-1 coefficients for view dependence
            features[..., channel * 9 + 1 : channel * 9 + 4] += (
                rng.uniform(-0.5, 0.5, size=3).astype(np.float32) * blob[..., None]
            )

    if converged:
        # a trained relu field: identity preactivation + relu postactivation, raw
        # density properly negative in empty space (the default "abs" preactivation
        # would turn -1.0 into sigma=1.0 fog everywhere)
        densities = np.where(densities > 0.05, densities, -1.0).astype(np.float32)
        return VoxelGrid(
            densities=jnp.asarray(densities[..., None]),
            features=jnp.asarray(features),
            voxel_size=VoxelSize(3.0 / grid_size, 3.0 / grid_size, 3.0 / grid_size),
            density_preactivation="identity",
            density_postactivation="relu",
        )

    return VoxelGrid(
        densities=jnp.asarray(densities[..., None]),
        features=jnp.asarray(features),
        voxel_size=VoxelSize(3.0 / grid_size, 3.0 / grid_size, 3.0 / grid_size),
    )


@click.command()
@click.option("-o", "--output_path", type=click.Path(file_okay=False), required=True)
@click.option("--num_train", type=int, default=20, show_default=True)
@click.option("--num_test", type=int, default=4, show_default=True)
@click.option("--image_size", type=int, default=128, show_default=True)
@click.option("--grid_size", type=int, default=64, show_default=True)
@click.option("--seed", type=int, default=3, show_default=True)
@click.option("--gt_samples_per_ray", type=int, default=256, show_default=True,
              help="samples/ray for rendering the GT images; high values (1024+) "
                   "approach the continuum so no trainer's quadrature is favoured")
@click.option("--render_procedure", type=click.Choice(["render_sh_voxel_grid", "render_sh_voxel_grid_fast"]),
              default="render_sh_voxel_grid_fast", show_default=True)
def main(output_path, num_train, num_test, image_size, grid_size, seed, gt_samples_per_ray, render_procedure):
    import imageio.v2 as imageio

    output_path = Path(output_path)
    grid = make_blob_scene(grid_size=grid_size, seed=seed)

    focal = image_size * 1.1
    intrinsics = CameraIntrinsics(image_size, image_size, focal)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=gt_samples_per_ray,
        camera_bounds=CameraBounds(NEAR, FAR),
        perturb_sampled_points=False,
        white_bkgd=True,
        # 1024-spp GT renders at the default 32768-ray chunks can exceed
        # single-chip HBM (compile-time OOM observed at 200px/1024spp);
        # smaller chunks cost only dispatch count
        parallel_rays_chunk_size=min(8192, 32768),
    )
    vol_mod = VolumetricModel(
        grid, render_procedure=render_procedure, render_config=config
    )

    rng = np.random.default_rng(seed)
    splits = {"train": num_train, "test": num_test}
    for split, count in splits.items():
        img_dir = output_path / split
        img_dir.mkdir(parents=True, exist_ok=True)
        params = {}
        for i in range(count):
            yaw = rng.uniform(0.0, 360.0)
            pitch = rng.uniform(-70.0, -10.0)
            pose = pose_spherical(yaw, pitch, radius=4.0)
            out = vol_mod.render(pose, intrinsics)
            name = f"r_{i}.png"
            imageio.imwrite(img_dir / name, to8b(np.asarray(out.colour)))
            params[name] = {
                INTRINSIC: {
                    BOUNDS: [NEAR, FAR],
                    HEIGHT: image_size,
                    WIDTH: image_size,
                    FOCAL: focal,
                },
                EXTRINSIC: {
                    ROTATION: pose.rotation.tolist(),
                    TRANSLATION: pose.translation.tolist(),
                },
            }
        with open(output_path / f"{split}_camera_params.json", "w") as f:
            json.dump(params, f, indent=2)
        log.info(f"wrote {count} {split} images to {img_dir}")

    np.savez(
        output_path / "ground_truth_grid.npz",
        densities=np.asarray(grid.densities),
        features=np.asarray(grid.features),
    )
    log.info(f"synthetic dataset complete at {output_path}")


if __name__ == "__main__":
    main()
