"""CLI flag-surface smoke tests via click's test runner: --help must list the full
reference flag surface, and bad values must be rejected cleanly."""
import importlib.util
import sys
from pathlib import Path

import pytest
from click.testing import CliRunner

APPS = Path(__file__).resolve().parent.parent / "apps"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, APPS / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def train_cli():
    return _load("train_sh_voxel_grid").main


@pytest.fixture(scope="module")
def render_cli():
    return _load("render_sh_voxel_grid").main


@pytest.fixture(scope="module")
def diffusion_cli():
    return _load("train_thre3infusion").main


def test_train_cli_flag_surface(train_cli):
    result = CliRunner().invoke(train_cli, ["--help"])
    assert result.exit_code == 0
    for flag in (
        "--data_path", "--output_path", "--separate_train_test_folders",
        "--data_downsample_factor", "--grid_dims", "--grid_location",
        "--normalize_scene_scale", "--grid_world_size", "--sh_degree",
        "--use_relu_field", "--use_softplus_field", "--render_num_samples_per_ray",
        "--parallel_rays_chunk_size", "--white_bkgd", "--ray_batch_size",
        "--train_num_samples_per_ray", "--num_stages", "--num_iterations_per_stage",
        "--scale_factor", "--learning_rate", "--lr_decay_steps_per_stage",
        "--lr_decay_gamma_per_stage", "--stagewise_lr_decay_gamma",
        "--apply_diffuse_render_regularization", "--save_frequency",
        "--test_frequency", "--feedback_frequency", "--summary_frequency",
        "--verbose_rendering", "--fast_debug_mode", "--resume_from", "--use_mesh",
        "--render_procedure", "--fast_topk",
    ):
        assert flag in result.output, f"missing CLI flag {flag}"


def test_render_cli_flag_surface(render_cli):
    result = CliRunner().invoke(render_cli, ["--help"])
    assert result.exit_code == 0
    for flag in (
        "--model_path", "--output_path", "--overridden_num_samples_per_ray",
        "--render_scale_factor", "--camera_path", "--camera_pitch", "--num_frames",
        "--vertical_camera_height", "--num_spiral_rounds", "--fps",
    ):
        assert flag in result.output, f"missing CLI flag {flag}"


def test_diffusion_cli_flag_surface(diffusion_cli):
    result = CliRunner().invoke(diffusion_cli, ["--help"])
    assert result.exit_code == 0
    for flag in (
        "--model_path", "--output_path", "--model_channels", "--num_res_blocks",
        "--num_heads", "--num_timesteps", "--beta_schedule", "--num_iters",
        "--batch_size", "--learning_rate", "--crop_ratio",
    ):
        assert flag in result.output, f"missing CLI flag {flag}"


def test_bad_camera_path_rejected(render_cli):
    result = CliRunner().invoke(
        render_cli, ["-i", "x.json", "-o", "/tmp/x", "--camera_path", "zigzag"]
    )
    assert result.exit_code != 0
    assert "zigzag" in result.output


def test_render_procedure_fallback_routing(train_cli):
    """Unsupported (procedure, sh_degree, softplus) combos route to a capable
    procedure with a logged switch, never an in-kernel assert (ADVICE round 3:
    --sh_degree 4 under the gnomonic default must not die)."""
    resolve = sys.modules["train_sh_voxel_grid"].resolve_render_procedure
    gn, br, fast = (
        "render_sh_voxel_grid_gnomonic",
        "render_sh_voxel_grid_bricked",
        "render_sh_voxel_grid_fast",
    )
    assert resolve(gn, 2, False) == gn
    assert resolve(gn, 3, False) == gn
    assert resolve(gn, 4, False) == fast
    assert resolve(gn, 2, True) == fast
    assert resolve(br, 2, False) == br
    assert resolve(br, 3, False) == gn
    assert resolve(br, 4, False) == fast
    assert resolve(br, 2, True) == fast
    assert resolve(fast, 4, True) == fast


def test_bad_downsample_rejected(train_cli):
    result = CliRunner().invoke(
        train_cli, ["-d", "/tmp", "-o", "/tmp/x", "--data_downsample_factor", "0.5"]
    )
    assert result.exit_code != 0
