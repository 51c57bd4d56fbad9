"""Sinusoidal embeddings used by the denoiser.

Two deliberately different formulas live in the reference and both are
reproduced bit-exactly here:

  * `timestep_embedding` — GLIDE-style, `concatDiT.py:48-67`:
    freqs = exp(-ln(10000) * arange(half) / half), output order [cos | sin].
  * `guidance_scale_embedding` — VDM-style, `scheduling_lcm.py:87-113` /
    `lcm_audio.py:596-617`: w is scaled by 1000, divisor is (half-1),
    output order [sin | cos].
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """(B,) timesteps -> (B, dim) sinusoidal embedding, [cos | sin] order."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def guidance_scale_embedding(w: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """(B,) guidance weights -> (B, dim) embedding, [sin | cos] order.

    Callers pass w = guidance_scale - 1 (inference, `scheduling_lcm.py:359`)
    or w ~ U[w_min, w_max] (distillation, `lcm_audio.py:629`).
    """
    w = w.astype(jnp.float32) * 1000.0
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = w[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
