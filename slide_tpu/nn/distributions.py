"""Diagonal Gaussian posterior (`data_utils/distributions.py:4-43`),
channels-last: parameters (…, 2C) split into mean/logvar over the last axis
(the reference splits the channel axis of (B, C, N) — same split)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    mean: jax.Array
    logvar: jax.Array

    @staticmethod
    def from_parameters(parameters: jax.Array) -> "DiagonalGaussian":
        c = parameters.shape[-1]
        if c % 2 != 0:
            raise ValueError("parameter channels must be even (mean|logvar)")
        mean = parameters[..., : c // 2]
        logvar = jnp.clip(parameters[..., c // 2:], -30.0, 20.0)
        return DiagonalGaussian(mean, logvar)

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jax.Array:
        """KL vs N(0, I) (or another diagonal gaussian), summed over all
        non-batch dims -> (B,)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar,
                                 axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var + self.var / other.var
            - 1.0 - self.logvar + other.logvar, axis=axes)

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        log2pi = np.log(2.0 * np.pi)
        return 0.5 * jnp.sum(log2pi + self.logvar
                             + (sample - self.mean) ** 2 / self.var, axis=axes)
