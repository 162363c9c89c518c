"""Misc host-side utilities.

Parity: reference thre3d_atom/utils/misc.py (compute_thre3d_grid_sizes:38-50,
log_config_to_disk:53-58, check_power_of_2:10). The reference's ``batchify`` chunked-map
combinator (misc.py:14-35) has no direct equivalent here: under jit, chunking is done with
``jax.lax.map`` over statically shaped chunks (see rendering/renderer.py).
"""
from pathlib import Path
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import yaml

from thr3ed_atom_tpu.utils.logging import log


def check_power_of_2(x: int) -> bool:
    return x != 0 and (x & (x - 1)) == 0


def batchify(processor_fn, collate_fn, chunk_size, verbose: bool = False):
    """Host-side chunked-map combinator: chunk -> process -> collate
    (API parity with reference utils/misc.py:14-35).

    Note: inside jit, prefer static shapes or ``jax.lax.map`` — this combinator is for
    HOST loops over device calls (e.g. processing a list-sized input with a fixed-shape
    compiled function), where each chunk is one dispatch.
    """

    def batchified(x):
        if chunk_size is None or len(x) <= chunk_size:
            return processor_fn(x)
        iterator = range(0, len(x), chunk_size)
        if verbose:
            from tqdm import tqdm

            iterator = tqdm(iterator)
        return collate_fn([processor_fn(x[i : i + chunk_size]) for i in iterator])

    return batchified


def compute_thre3d_grid_sizes(
    final_required_resolution: Tuple[int, int, int],
    num_stages: int,
    scale_factor: float,
) -> Sequence[Tuple[int, int, int]]:
    """Stagewise grid resolutions: repeatedly ceil-divide the final resolution by
    ``scale_factor``, so e.g. 256^3 over 4 stages x2 gives [32^3, 64^3, 128^3, 256^3]."""
    x, y, z = final_required_resolution
    grid_sizes = [(x, y, z)]
    for _ in range(num_stages - 1):
        x = int(np.ceil((1 / scale_factor) * x))
        y = int(np.ceil((1 / scale_factor) * y))
        z = int(np.ceil((1 / scale_factor) * z))
        grid_sizes.insert(0, (x, y, z))
    return grid_sizes


def log_config_to_disk(args: Dict[str, Any], output_dir: Path, config_name: str = "config") -> None:
    """Dump the run configuration as YAML for reproducibility."""
    output_dir.mkdir(parents=True, exist_ok=True)
    config_file = output_dir / f"{config_name}.yml"
    log.info(f"Logging configuration file at: {config_file}")
    with open(config_file, "w") as f:
        yaml.dump(dict(args), f, default_flow_style=False)
