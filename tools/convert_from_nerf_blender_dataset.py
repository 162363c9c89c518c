"""Convert a NeRF-synthetic (blender) scene into the per-image camera-params JSON format.

Parity: reference tools/convert_from_nerf_blender_dataset.py:33-94 — reads
``transforms_{train,val,test}.json``, derives focal from ``camera_angle_x`` and the first
image's resolution, hardcodes NEAR, FAR = 2.0, 6.0, and writes
``{split}_camera_params.json`` files keyed by image filename.
"""
import json
from pathlib import Path

import click
import numpy as np
from PIL import Image

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

SPLITS = ("train", "val", "test")
NEAR, FAR = 2.0, 6.0


@click.command()
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the original nerf synthetic dataset scene")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for outputting the converted scene")
def main(data_path: str, output_path: str) -> None:
    data_path, output_path = Path(data_path), Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    log.info(f"loading the data from source path: {data_path}")
    for split in SPLITS:
        with open(data_path / f"transforms_{split}.json") as f:
            meta = json.load(f)

        first_name = meta["frames"][0]["file_path"].split("/")[-1] + ".png"
        with Image.open(data_path / split / first_name) as img:
            width, height = img.size
        focal = 0.5 * width / np.tan(0.5 * float(meta["camera_angle_x"]))

        converted = {}
        for frame in meta["frames"]:
            filename = frame["file_path"].split("/")[-1] + ".png"
            transform = np.array(frame["transform_matrix"])
            converted[filename] = {
                INTRINSIC: {
                    BOUNDS: [NEAR, FAR],
                    HEIGHT: height,
                    WIDTH: width,
                    FOCAL: focal,
                },
                EXTRINSIC: {
                    ROTATION: transform[:3, :3].tolist(),
                    TRANSLATION: transform[:3, -1:].tolist(),
                },
            }

        out_file = output_path / f"{split}_camera_params.json"
        with open(out_file, "w", encoding="utf-8") as f:
            json.dump(converted, f, ensure_ascii=False, indent=4)
        log.info(f"wrote {out_file} ({len(converted)} poses)")


if __name__ == "__main__":
    main()
