"""Training CLI: reconstruct an SH voxel grid from posed images.

Same flag surface as the reference's
thre3d_elements/relu_fields/train_sh_based_voxel_grid_with_posed_images.py:38-132, minus
torch-specific knobs (num_workers — there is no dataloader; data lives in HBM).
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset  # noqa: E402
from thr3ed_atom_tpu.models.voxels import (  # noqa: E402
    VoxelGridLocation,
    VoxelSize,
    create_voxel_grid,
)
from thr3ed_atom_tpu.modules.trainer import (  # noqa: E402
    train_sh_vox_grid_vol_mod_with_posed_images,
)
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel  # noqa: E402
from thr3ed_atom_tpu.rendering.rays import (  # noqa: E402
    compute_expected_density_scale_for_relu_field_grid,
)
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig  # noqa: E402
from thr3ed_atom_tpu.utils.constants import NUM_COLOUR_CHANNELS, SEED  # noqa: E402
from thr3ed_atom_tpu.utils.logging import log  # noqa: E402
from thr3ed_atom_tpu.utils.misc import log_config_to_disk  # noqa: E402


def resolve_render_procedure(
    render_procedure: str, sh_degree: int, use_softplus_field: bool
) -> str:
    """Route the requested procedure around the Pallas kernels' static limits.

    The march kernels support identity/relu density postactivation only; the
    slab-march (bricked) kernel packs (features ++ density) into 32-lane slabs
    (SH degree <= 2); the gnomonic pipeline's dense texel formulation has no
    lane cap but its in-kernel SH basis stops at degree 3. ops/sh.py and the
    classic/fast renderers go to degree 4, so anything unsupported falls back
    to render_sh_voxel_grid_fast with a logged switch instead of an assert."""
    if render_procedure == "render_sh_voxel_grid_bricked" and (
        sh_degree > 2 or use_softplus_field
    ):
        if use_softplus_field:
            log.info(
                "bricked renderer does not support softplus fields; "
                "falling back to render_sh_voxel_grid_fast"
            )
            return "render_sh_voxel_grid_fast"
        log.info(
            "bricked renderer supports sh_degree <= 2; using the gnomonic "
            "shear-warp procedure for sh_degree 3+"
        )
        render_procedure = "render_sh_voxel_grid_gnomonic"
    if render_procedure == "render_sh_voxel_grid_gnomonic" and (
        sh_degree > 3 or use_softplus_field
    ):
        reason = (
            "softplus fields" if use_softplus_field
            else f"sh_degree {sh_degree} (supports <= 3)"
        )
        log.info(
            f"gnomonic renderer does not support {reason}; "
            "falling back to render_sh_voxel_grid_fast"
        )
        return "render_sh_voxel_grid_fast"
    return render_procedure


# fmt: off
@click.command()
# Required arguments:
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the input dataset")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for training output")
# Input dataset related arguments:
@click.option("--separate_train_test_folders", type=click.BOOL, default=True,
              help="whether the data directory has separate train and test folders", show_default=True)
@click.option("--data_downsample_factor", type=click.FloatRange(min=1.0), default=2.0,
              help="downscale factor for the input images", show_default=True)
# Voxel-grid related arguments:
@click.option("--grid_dims", type=click.INT, nargs=3, default=(256, 256, 256),
              help="dimensions (#voxels) of the grid along x, y and z axes", show_default=True)
@click.option("--grid_location", type=click.FLOAT, nargs=3, default=(0.0, 0.0, 0.0),
              help="world location of the grid center", show_default=True)
@click.option("--normalize_scene_scale", type=click.BOOL, default=False,
              help="whether to normalize the scene's scale to unit radius", show_default=True)
@click.option("--grid_world_size", type=click.FLOAT, nargs=3, default=(3.0, 3.0, 3.0),
              help="size (extent) of the grid in world coordinate system", show_default=True)
@click.option("--sh_degree", type=click.INT, default=2,
              help="degree of the spherical harmonics coefficients. Supported: [0, 1, 2, 3]",
              show_default=True)
@click.option("--use_relu_field", type=click.BOOL, default=True,
              help="whether to use relu_fields or revert to traditional grids", show_default=True)
@click.option("--use_softplus_field", type=click.BOOL, default=False,
              help="whether to use softplus_field instead of relu_field", show_default=True)
# Rendering related arguments:
@click.option("--render_num_samples_per_ray", type=click.INT, default=1024,
              help="number of samples taken per ray during rendering", show_default=True)
@click.option("--parallel_rays_chunk_size", type=click.INT, default=32768,
              help="number of parallel rays per render chunk", show_default=True)
@click.option("--white_bkgd", type=click.BOOL, default=True,
              help="whether to use white background for synthetic scenes", show_default=True)
@click.option("--render_procedure",
              type=click.Choice(["render_sh_voxel_grid_gnomonic",
                                 "render_sh_voxel_grid_bricked",
                                 "render_sh_voxel_grid_fast", "render_sh_voxel_grid",
                                 "render_sh_voxel_grid_hierarchical"]),
              default="render_sh_voxel_grid_gnomonic", show_default=True,
              help="gnomonic = shear-warp pipeline (whole-pose training steps, "
                   "dense MXU resample, SH degree <= 3) — the production default: "
                   "fastest measured path AND best end-to-end heldout PSNR "
                   "(PARITY_RUN.md round-3 re-run: 36.2 fast-eval vs 34.2 "
                   "reference/classic on the parity protocol); "
                   "bricked = fused slab-march Pallas kernel (tile-based training, "
                   "whole-image renders); "
                   "fast = two-phase top-K over packed tables (float-precision parity); "
                   "exact = reference-semantics gather path; hierarchical = coarse-to-fine "
                   "importance sampling (num_samples is the total budget)")
@click.option("--gnomonic_pos_per_cell", type=click.INT, default=0, show_default=True,
              help="gnomonic march positions per cell (1/2/4/8; 0 = auto: constant "
                   "world-space quadrature across stages)")
@click.option("--gnomonic_supersample", type=click.FLOAT, default=1.25, show_default=True,
              help="gnomonic texel grid supersampling over the image (a texels-per-voxel "
                   "floor of 2.5 engages automatically at small images)")
@click.option("--gnomonic_warp_order", type=click.INT, default=3, show_default=True,
              help="gnomonic projective warp: 1 = bilinear, 3 = hull-clamped "
                   "Catmull-Rom, 5 = prefiltered B-spline")
@click.option("--gnomonic_qb", type=click.INT, default=128, show_default=True,
              help="gnomonic q-block width (multiple of 128; 0 = whole-height stripes): "
                   "finer-grain occupancy skipping and early exit in the composite kernel")
@click.option("--gnomonic_poses_per_step", type=click.INT, default=0, show_default=True,
              help="training views averaged per gnomonic whole-pose step "
                   "(0 = auto from ray_batch_size, floored for view diversity)")
@click.option("--fast_topk", type=click.INT, default=64, show_default=True,
              help="samples per ray shaded in the fast procedure's feature phase")
@click.option("--fast_bf16_features", type=click.BOOL, default=False, show_default=True,
              help="store the packed feature table in bfloat16 (halves phase-2 bytes)")
@click.option("--fast_pack_features", type=click.BOOL, default=True, show_default=True,
              help="cell-pack the feature table (8x memory for ~1.6x speed); turn OFF "
                   "for 256^3+ grids where the packed table exceeds HBM")
# Training related arguments:
@click.option("--ray_batch_size", type=click.INT, default=16384,
              help="number of randomly sampled rays per training iteration", show_default=True)
@click.option("--train_num_samples_per_ray", type=click.INT, default=512,
              help="number of samples taken per ray during training", show_default=True)
@click.option("--num_stages", type=click.INT, default=4,
              help="number of progressive growing stages", show_default=True)
@click.option("--num_iterations_per_stage", type=click.INT, default=7000,
              help="training iterations per stage", show_default=True)
@click.option("--scale_factor", type=click.FLOAT, default=2.0,
              help="grid up-scale factor after each stage", show_default=True)
@click.option("--learning_rate", type=click.FLOAT, default=0.03,
              help="initial Adam learning rate", show_default=True)
@click.option("--lr_decay_steps_per_stage", type=click.INT, default=3000,
              help="iterations between exponential lr decays within a stage", show_default=True)
@click.option("--lr_decay_gamma_per_stage", type=click.FLOAT, default=0.1,
              help="per-stage exponential lr decay gamma", show_default=True)
@click.option("--stagewise_lr_decay_gamma", type=click.FLOAT, default=1.0,
              help="lr reduction factor applied after each stage", show_default=True)
@click.option("--apply_diffuse_render_regularization", type=click.BOOL, default=True,
              help="whether to apply the diffuse render regularization", show_default=True)
@click.option("--use_mesh", type=click.BOOL, default=False,
              help="shard the ray batch across all local devices (data parallel)", show_default=True)
@click.option("--resume_from", type=click.Path(dir_okay=False), default=None,
              help="checkpoint (.npz/.json pair) to resume training from; restarts at the "
                   "stage whose grid resolution matches the checkpoint")
# Various frequencies:
@click.option("--save_frequency", type=click.INT, default=250, show_default=True)
@click.option("--test_frequency", type=click.INT, default=250, show_default=True)
@click.option("--feedback_frequency", type=click.INT, default=100, show_default=True)
@click.option("--summary_frequency", type=click.INT, default=50, show_default=True)
# Miscellaneous modes:
@click.option("--verbose_rendering", type=click.BOOL, default=False, show_default=True)
@click.option("--fast_debug_mode", type=click.BOOL, default=False,
              help="skips testing and some lengthy visualizations", show_default=True)
@click.option("--profile_dir", type=click.Path(file_okay=False), default=None,
              help="capture a jax.profiler trace of the training into this directory "
                   "(view with TensorBoard/Perfetto)")
# fmt: on
def main(**config) -> None:
    data_path = Path(config["data_path"])
    output_path = Path(config["output_path"])

    log.info("logging configuration file ...")
    log_config_to_disk(config, output_path)

    if config["separate_train_test_folders"]:
        train_dataset, test_dataset = (
            PosedImagesDataset(
                images_dir=data_path / mode,
                camera_params_json=data_path / f"{mode}_camera_params.json",
                normalize_scene_scale=config["normalize_scene_scale"],
                downsample_factor=config["data_downsample_factor"],
                rgba_white_bkgd=config["white_bkgd"],
            )
            for mode in ("train", "test")
        )
    else:
        train_dataset = PosedImagesDataset(
            images_dir=data_path / "images",
            camera_params_json=data_path / "camera_params.json",
            normalize_scene_scale=config["normalize_scene_scale"],
            downsample_factor=config["data_downsample_factor"],
            rgba_white_bkgd=config["white_bkgd"],
        )
        test_dataset = None

    # density activation mode (reference train CLI :169-192; terminology from DVGO)
    if config["use_relu_field"]:
        activations = {
            "density_preactivation": "identity",
            "density_postactivation": "relu",
            "expected_density_scale": compute_expected_density_scale_for_relu_field_grid(
                config["grid_world_size"]
            ),
        }
    elif config["use_softplus_field"]:
        activations = {
            "density_preactivation": "identity",
            "density_postactivation": "softplus",
            "expected_density_scale": compute_expected_density_scale_for_relu_field_grid(
                config["grid_world_size"]
            ),
        }
    else:
        activations = {
            "density_preactivation": "abs",
            "density_postactivation": "identity",
            "expected_density_scale": 1.0,
        }

    grid_dims = tuple(config["grid_dims"])
    voxel_size = VoxelSize(
        *[extent / dim for extent, dim in zip(config["grid_world_size"], grid_dims)]
    )
    num_sh_features = NUM_COLOUR_CHANNELS * ((config["sh_degree"] + 1) ** 2)
    voxel_grid = create_voxel_grid(
        jax.random.PRNGKey(SEED),
        grid_dims=grid_dims,
        num_features=num_sh_features,
        voxel_size=voxel_size,
        grid_location=VoxelGridLocation(*config["grid_location"]),
        **activations,
    )

    render_procedure = resolve_render_procedure(
        config["render_procedure"], config["sh_degree"], config["use_softplus_field"]
    )

    vol_mod = VolumetricModel(
        thre3d_repr=voxel_grid,
        render_procedure=render_procedure,
        render_config=SHVoxGridRenderConfig(
            num_samples_per_ray=config["train_num_samples_per_ray"],
            camera_bounds=train_dataset.camera_bounds,
            white_bkgd=config["white_bkgd"],
            render_num_samples_per_ray=config["render_num_samples_per_ray"],
            parallel_rays_chunk_size=config["parallel_rays_chunk_size"],
            fast_topk=config["fast_topk"],
            fast_bf16_features=config["fast_bf16_features"],
            fast_pack_features=config["fast_pack_features"],
            gnomonic_pos_per_cell=config["gnomonic_pos_per_cell"],
            gnomonic_supersample=config["gnomonic_supersample"],
            gnomonic_warp_order=config["gnomonic_warp_order"],
            gnomonic_qb=config["gnomonic_qb"],
        ),
    )

    from thr3ed_atom_tpu.utils.profiling import profile_trace

    with profile_trace(config["profile_dir"]):
        train_sh_vox_grid_vol_mod_with_posed_images(
            vol_mod=vol_mod,
            train_dataset=train_dataset,
            output_dir=output_path,
            test_dataset=test_dataset,
            ray_batch_size=config["ray_batch_size"],
            num_stages=config["num_stages"],
            num_iterations_per_stage=config["num_iterations_per_stage"],
            scale_factor=config["scale_factor"],
            learning_rate=config["learning_rate"],
            lr_decay_gamma_per_stage=config["lr_decay_gamma_per_stage"],
            lr_decay_steps_per_stage=config["lr_decay_steps_per_stage"],
            stagewise_lr_decay_gamma=config["stagewise_lr_decay_gamma"],
            save_freq=config["save_frequency"],
            test_freq=config["test_frequency"],
            feedback_freq=config["feedback_frequency"],
            summary_freq=config["summary_frequency"],
            apply_diffuse_render_regularization=config["apply_diffuse_render_regularization"],
            use_mesh=config["use_mesh"],
            verbose_rendering=config["verbose_rendering"],
            fast_debug_mode=config["fast_debug_mode"],
            resume_from=config["resume_from"],
            gnomonic_poses_per_step=config["gnomonic_poses_per_step"],
        )


if __name__ == "__main__":
    main()
