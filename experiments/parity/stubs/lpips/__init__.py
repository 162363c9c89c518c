"""Minimal lpips stand-in: the real package is unavailable in this environment.

Returns zeros so the reference trainer's TEST_SET_LPIPS path runs; the parity
comparison (PARITY_RUN.md) is on PSNR only.
"""
import torch


class LPIPS(torch.nn.Module):
    def __init__(self, net="vgg"):
        super().__init__()
        self.net = net

    def forward(self, a, b, normalize=False):
        del normalize
        return torch.zeros(a.shape[0] if a.dim() == 4 else 1)
