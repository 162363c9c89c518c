"""3inFusion training launcher.

Parity: reference thre3d_elements/thre3infusion/train.py:27-76 — the same recipe
(UNet: base 32 channels, 1 resblock/level, mult (1,2,4,8), bottleneck attention, dims=3,
checkpointing, 4 heads, scale-shift norm; diffusion: cosine 500-step EPSILON /
FIXED_SMALL / MSE; training: crop_ratio 0.8, batch 32, lr 8e-5, 100k iters) — but with
the hardcoded personal paths replaced by CLI options.
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from thr3ed_atom_tpu.diffusion.gaussian_diffusion import (  # noqa: E402
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
)
from thr3ed_atom_tpu.diffusion.model import Thre3inFusionModel  # noqa: E402
from thr3ed_atom_tpu.diffusion.unet import UNetModel  # noqa: E402
from thr3ed_atom_tpu.utils.logging import log  # noqa: E402


# fmt: off
@click.command()
@click.option("-i", "--model_path", type=click.Path(dir_okay=False), required=True,
              help="path to the trained VolumetricModel checkpoint (.npz/.json pair)")
@click.option("-o", "--output_path", type=click.Path(file_okay=False), required=True,
              help="path for training output")
@click.option("--model_channels", type=click.INT, default=32, show_default=True)
@click.option("--num_res_blocks", type=click.INT, default=1, show_default=True)
@click.option("--num_heads", type=click.INT, default=4, show_default=True)
@click.option("--num_timesteps", type=click.INT, default=500, show_default=True)
@click.option("--beta_schedule", type=click.Choice(["linear", "cosine"]), default="cosine",
              show_default=True)
@click.option("--num_iters", type=click.INT, default=100_000, show_default=True)
@click.option("--batch_size", type=click.INT, default=32, show_default=True)
@click.option("--learning_rate", type=click.FLOAT, default=8e-5, show_default=True)
@click.option("--crop_ratio", type=click.FLOAT, default=0.8, show_default=True)
@click.option("--loss_feedback_frequency", type=click.INT, default=50, show_default=True)
@click.option("--sample_frequency", type=click.INT, default=5000, show_default=True)
@click.option("--save_frequency", type=click.INT, default=5000, show_default=True)
@click.option("--use_checkpoint", type=click.BOOL, default=True, show_default=True,
              help="gradient checkpointing (jax.checkpoint) in the UNet resblocks")
@click.option("--visualization_samples", type=click.INT, default=9, show_default=True,
              help="number of grids sampled (sequentially) for the periodic mosaic video")
# fmt: on
def main(**config) -> None:
    # channel count adapts to the loaded scene: density + all SH feature channels
    # (the reference hardcodes 4, i.e. degree-0 scenes only — train.py:31-33)
    from thr3ed_atom_tpu.modules.volumetric_model import (
        create_volumetric_model_from_saved_model,
    )

    vol_mod, _ = create_volumetric_model_from_saved_model(Path(config["model_path"]))
    grid_channels = 1 + vol_mod.thre3d_repr.num_features
    log.info(f"scene grid has {grid_channels} channels (density + SH features)")

    unet = UNetModel(
        in_channels=grid_channels,
        model_channels=config["model_channels"],
        out_channels=grid_channels,
        num_res_blocks=config["num_res_blocks"],
        attention_resolutions=(),
        use_bottleneck_attn=True,
        channel_mult=(1, 2, 4, 8),
        conv_resample=True,
        dims=3,
        num_classes=None,
        use_checkpoint=config["use_checkpoint"],
        num_heads=config["num_heads"],
        num_head_channels=-1,
        use_scale_shift_norm=True,
        resblock_updown=False,
    )
    log.info("UNet model has been created ...")

    diffusion = GaussianDiffusion(
        betas=get_named_beta_schedule(
            schedule_name=config["beta_schedule"],
            num_diffusion_timesteps=config["num_timesteps"],
        ),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )

    model = Thre3inFusionModel(unet=unet, diffusion=diffusion)
    model.train(
        volume_model_path=Path(config["model_path"]),
        output_path=Path(config["output_path"]),
        num_iters=config["num_iters"],
        learning_rate=config["learning_rate"],
        crop_ratio=config["crop_ratio"],
        batch_size=config["batch_size"],
        loss_feedback_frequency=config["loss_feedback_frequency"],
        sample_frequency=config["sample_frequency"],
        save_frequency=config["save_frequency"],
        visualization_samples=config["visualization_samples"],
    )


if __name__ == "__main__":
    main()
