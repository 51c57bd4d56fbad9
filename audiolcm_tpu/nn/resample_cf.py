"""Channels-first (B, C, T) variants of the alias-free snake activation
and 1D conv, for BigVGAN's narrow stages.

Rationale (xplane trace, v5e): in (B, T, C) layout the elementwise snake
fusions put C on the 128-lane axis — at C=24..48 that wastes 62-81% of
VPU throughput, and the snake chain is 228 ms/iter of the vocoder. In
(B, C, T) the last dim T rides the lanes at 100% and C pads only the
sublanes. The stage transposes in/out once; everything inside stays cf.

Numerics identical to the channels-last path (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.nn.resample import kaiser_sinc_filter1d


def _taps():
    up = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64) * 2.0
    up_even = [float(up[15 - 2 * d]) for d in range(2, 8)]
    up_odd = [float(up[16 - 2 * d]) for d in range(3, 9)]
    down = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    return up_even, up_odd, [float(v) for v in down[0::2]], [float(v) for v in down[1::2]]


_UP_E, _UP_O, _DN_E, _DN_O = _taps()


def _corr_t(xp: jnp.ndarray, taps, out_len: int) -> jnp.ndarray:
    """sum_d taps[d] * xp[..., d:d+out_len] (static slices on the T axis)."""
    acc = None
    for d, w in enumerate(taps):
        sl = jax.lax.slice_in_dim(xp, d, d + out_len, axis=-1)
        acc = w * sl if acc is None else acc + w * sl
    return acc


def alias_free_snake_cf(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, fast: bool = False
) -> jnp.ndarray:
    """(B, C, T) fused down2x(snakebeta(up2x(x))); alpha/beta (C,) linear scale.

    Same analytic polyphase composition as resample.alias_free_activation_fused
    (interleave eliminated; boundary = edge replication on the interleaved u).
    fast=True uses the polynomial cos (see nn/snake.py).
    """
    from audiolcm_tpu.nn.snake import fast_cos

    cos = fast_cos if fast else jnp.cos
    t = x.shape[-1]
    xp5 = jnp.pad(x, ((0, 0), (0, 0), (5, 5)), mode="edge")
    ue = _corr_t(jax.lax.slice_in_dim(xp5, 2, xp5.shape[-1], axis=-1), _UP_E, t)
    uo = _corr_t(jax.lax.slice_in_dim(xp5, 3, xp5.shape[-1], axis=-1), _UP_O, t)
    a = alpha[None, :, None]
    binv = (1.0 / (beta + 1e-9))[None, :, None]
    sin2 = lambda h: 0.5 * (1.0 - cos(2.0 * a * h))
    ae = ue + sin2(ue) * binv
    ao = uo + sin2(uo) * binv
    left = jnp.broadcast_to(ae[:, :, :1], ae.shape[:2] + (3,))
    right = jnp.broadcast_to(ao[:, :, -1:], ao.shape[:2] + (3,))
    ao_p = jnp.concatenate([left, ao, right[:, :, :2]], axis=-1)
    ae_p = jnp.concatenate([left[:, :, :2], ae, right], axis=-1)
    return _corr_t(ao_p, _DN_E, t) + _corr_t(ae_p, _DN_O, t)


def conv1d_cf(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
              dilation: int = 1) -> jnp.ndarray:
    """(B, C_in, T) conv with SAME padding; kernel (k, C_in, C_out) — the
    exact nn.Conv param layout, so checkpoints are shared with the
    channels-last path. Per-tap batched matmuls keep the MXU contraction on
    C_in while T stays on lanes."""
    k = kernel.shape[0]
    pad = (k * dilation - dilation) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    t = x.shape[-1]
    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t, axis=-1)
        term = jnp.einsum("io,bit->bot", kernel[j], sl,
                          preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return (acc + bias[None, :, None]).astype(x.dtype)
