"""Data utilities (parity: reference thre3d_atom/data/utils.py:9-47).

The reference's torchvision transform pipeline (ToTensor -> optional flip -> Resize)
and DataLoader-based ``infinite_dataloader`` become: a PIL/numpy image transform (the
dataset already applies it internally) and an infinite batch generator over the
device-resident arrays driven by explicit PRNG keys.
"""
from typing import Iterator, Optional, Tuple

import jax
import numpy as np
from PIL import Image


def get_image_transform(
    new_size: Optional[Tuple[int, int]] = None, flip_horizontal: bool = False
):
    """PIL image -> [H, W, C] float32 in [0, 1], optionally flipped/resized."""

    def transform(image: Image.Image) -> np.ndarray:
        if flip_horizontal:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
        if new_size is not None and image.size != (new_size[1], new_size[0]):
            image = image.resize((new_size[1], new_size[0]), Image.BILINEAR)
        return np.asarray(image, dtype=np.float32) / 255.0

    return transform


def infinite_batches(
    key: jax.Array, dataset, batch_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Endless (images, poses) batches sampled uniformly with replacement from a
    PosedImagesDataset (counterpart of reference data/utils.py:44-47)."""
    num = len(dataset)
    while True:
        key, sub = jax.random.split(key)
        idx = np.asarray(jax.random.randint(sub, (batch_size,), 0, num))
        yield dataset.images[idx], dataset.poses[idx]
