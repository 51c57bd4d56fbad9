"""Snake periodic activations (BigVGAN nonlinearity).

Behavior parity: `vocoder/bigvgan/activations.py:9-119`:
  Snake(x)     = x + (1/(alpha+1e-9)) * sin^2(alpha * x)
  SnakeBeta(x) = x + (1/(beta +1e-9)) * sin^2(alpha * x)
with per-channel alpha/beta; in logscale mode (the shipped config) the
stored parameters are exponentiated first and initialized to zero.

These are pure VPU elementwise ops; XLA fuses them into the surrounding
convs. sin^2 is computed as (1-cos(2ax))/2 to halve transcendental count.

The vocoder's late stages are bound by these transcendentals (DESIGN.md):
`fast=True` swaps the builtin cos for a range-reduced even polynomial
(`fast_cos`, max abs error 4.8e-7 in f32 — far below bf16 output
resolution) for serving. Off by default to preserve bit-parity with the
reference math.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

# Degree-12 even polynomial for cos on [-pi, pi] (least-squares fit, max
# abs error 1.5e-8 on the interval) + two-constant Cody-Waite reduction:
# 2*pi = HI + LO with HI exactly representable in 8 mantissa bits, so
# k*HI is exact in f32 for |k| < 2^16 and the reduction holds its accuracy
# out to |v| ~ 1e4 (measured end-to-end max err 4.8e-7).
_COS_COEFS = (
    0.9999999922819011,
    -0.4999999177184745,
    0.04166652435962621,
    -0.0013887970390010532,
    2.4773423751927707e-05,
    -2.7113368760900975e-07,
    1.7369116668414461e-09,
)
_TWO_PI_HI = 6.28125
_TWO_PI_LO = 2.0 * math.pi - _TWO_PI_HI
_INV_TWO_PI = 1.0 / (2.0 * math.pi)


def fast_cos(v: jnp.ndarray) -> jnp.ndarray:
    """Polynomial cos: ~11 VPU ops vs the builtin's full-range reduction."""
    vf = v.astype(jnp.float32)
    k = jnp.round(vf * _INV_TWO_PI)
    xr = (vf - k * _TWO_PI_HI) - k * _TWO_PI_LO
    u = xr * xr
    acc = jnp.float32(_COS_COEFS[-1])
    for c in _COS_COEFS[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return acc.astype(v.dtype)


def snake_beta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, fast: bool = False
) -> jnp.ndarray:
    """x: (..., C); alpha/beta: (C,) already in linear scale."""
    cos = fast_cos if fast else jnp.cos
    sin2 = 0.5 * (1.0 - cos(2.0 * alpha * x))
    return x + sin2 / (beta + 1e-9)


class SnakeBeta(nn.Module):
    """Per-channel snake-beta; `alpha_logscale=True` matches the 16 kHz config."""

    alpha_logscale: bool = True
    fast: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        beta = self.param("beta", init, (channels,))
        if self.alpha_logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return snake_beta(x, alpha, beta, fast=self.fast)


class Snake(nn.Module):
    """Single-parameter snake (alpha doubles as the magnitude)."""

    alpha_logscale: bool = True
    fast: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
        return snake_beta(x, alpha, alpha, fast=self.fast)
