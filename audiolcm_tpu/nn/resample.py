"""Alias-free (anti-aliased) 1D resampling with kaiser-windowed sinc filters.

Behavior parity: `vocoder/bigvgan/alias_free_torch/{filter.py,resample.py,act.py}`:
  * kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
  * UpSample1d: replicate-pad, x`ratio` transposed depthwise conv with the
    sinc filter scaled by ratio, asymmetric crop
  * DownSample1d: replicate-pad, depthwise strided conv
  * Activation1d: up(2x) -> act -> down(2x)

TPU-first notes: the filters are static numpy constants baked into the
graph (not params); the depthwise convs use a single shared filter across
channels expressed via `feature_group_count=C` in lax.conv_general_dilated,
and the transposed conv is the same primitive with lhs_dilation — no
scatter, fully fusible. The sinc filters are even-symmetric so correlation
== convolution and no kernel flip is needed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Lowpass prototype, shape (kernel_size,), sums to 1 (`filter.py:28-57`)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _depthwise_conv(
    x: jnp.ndarray,
    filt: jnp.ndarray,
    stride: int = 1,
    lhs_dilation: int = 1,
    padding=(0, 0),
) -> jnp.ndarray:
    """Shared-filter depthwise conv on (B, T, C); filt: (K,)."""
    channels = x.shape[-1]
    kernel = jnp.broadcast_to(
        filt.astype(x.dtype)[:, None, None], (filt.shape[0], 1, channels)
    )
    # HIGHEST precision: these anti-aliasing filters shape the final audio
    # band edge; bf16 MXU accumulation here costs audible error while the
    # op itself is a tiny depthwise conv (negligible FLOPs).
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[padding],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """(B, T, C) -> (B, ratio*T, C), anti-aliased (`resample.py:10-33`)."""
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = jnp.asarray(
        kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    )
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose(stride=s) == conv with lhs_dilation=s and full padding
    out = ratio * _depthwise_conv(
        x, filt, stride=1, lhs_dilation=stride, padding=(kernel_size - 1, kernel_size - 1)
    )
    return out[:, pad_left:-pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """(B, T, C) -> (B, T/ratio, C), anti-aliased (`resample.py:36-49`)."""
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_conv(x, filt, stride=ratio)


def alias_free_activation(x: jnp.ndarray, act_fn) -> jnp.ndarray:
    """Activation1d: 2x upsample -> act -> 2x downsample (`act.py:8-27`)."""
    return downsample1d(act_fn(upsample1d(x, 2)), 2)
