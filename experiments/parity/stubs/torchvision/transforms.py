"""Minimal PIL-image transforms matching the torchvision semantics the reference
uses (data/utils.py): ToTensor (HWC uint8 -> CHW float in [0,1]),
RandomHorizontalFlip, Resize (bilinear, on tensors)."""
import numpy as np
import torch
import torch.nn.functional as F


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        if t.dtype == torch.uint8:
            t = t.float().div(255.0)
        return t


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, t):
        if torch.rand(()) < self.p:
            return torch.flip(t, dims=[-1])
        return t


class Resize:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, t):
        return F.interpolate(
            t[None], size=self.size, mode="bilinear", align_corners=False,
            antialias=True,
        )[0]
