"""Snake periodic activations (BigVGAN nonlinearity).

Behavior parity: `vocoder/bigvgan/activations.py:9-119`:
  Snake(x)     = x + (1/(alpha+1e-9)) * sin^2(alpha * x)
  SnakeBeta(x) = x + (1/(beta +1e-9)) * sin^2(alpha * x)
with per-channel alpha/beta; in logscale mode (the shipped config) the
stored parameters are exponentiated first and initialized to zero.

These are pure VPU elementwise ops; XLA fuses them into the surrounding
convs. sin^2 is computed as (1-cos(2ax))/2 to halve transcendental count.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x: (..., C); alpha/beta: (C,) already in linear scale."""
    sin2 = 0.5 * (1.0 - jnp.cos(2.0 * alpha * x))
    return x + sin2 / (beta + 1e-9)


class SnakeBeta(nn.Module):
    """Per-channel snake-beta; `alpha_logscale=True` matches the 16 kHz config."""

    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        beta = self.param("beta", init, (channels,))
        if self.alpha_logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return snake_beta(x, alpha, beta)


class Snake(nn.Module):
    """Single-parameter snake (alpha doubles as the magnitude)."""

    alpha_logscale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return snake_beta(x, alpha, alpha)
