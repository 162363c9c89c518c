"""Timestep schedule samplers (parity: reference
thre3d_elements/thre3infusion/timestep_sampler.py:7-48) with jax.random keys."""
from abc import ABC, abstractmethod
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ScheduleSampler(ABC):
    """A distribution over diffusion timesteps; unbiased importance sampling by
    default (weights reweight the loss so its mean is unchanged)."""

    @abstractmethod
    def weights(self) -> np.ndarray:
        """Positive per-timestep weights (need not be normalized)."""

    def sample(self, key: jax.Array, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = np.asarray(self.weights(), dtype=np.float64)
        p = w / w.sum()
        indices = jax.random.choice(
            key, len(p), shape=(batch_size,), p=jnp.asarray(p, jnp.float32)
        )
        weights = 1.0 / (len(p) * jnp.asarray(p, jnp.float32)[indices])
        return indices, weights


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.diffusion = diffusion
        self._weights = np.ones([diffusion.num_timesteps])

    def weights(self) -> np.ndarray:
        return self._weights
