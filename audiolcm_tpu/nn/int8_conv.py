"""Dynamic-int8 1D convolution for BigVGAN's wide stages (serving knob).

The C=768/C=384 resblock convs are MXU-bound at bf16 (xplane: ~47 ms of a
242 ms generate, floor ~30 ms). The TPU MXU runs int8 x int8 -> int32 at 2x
the bf16 rate, so dynamically quantizing activations (per-tensor scale) and
weights (per-output-channel scale) halves the floor. Quantization costs one
extra max-reduce + rescale pass over the activation — cheap next to the
convs at these widths.

Error: int8 carries a 7-bit mantissa + shared per-tensor exponent vs bf16's
8-bit mantissa + per-value exponent; for the near-normal activation
distributions of these stages the measured conv-output error is of the same
order as bf16 rounding (see tests/test_int8_conv.py). Opt-in knob
(`BigVGAN.int8_min_channels` / bench env `AUDIOLCM_INT8_MIN`), like the
other serving knobs; exact bf16 remains the default.

Reference anchor: the conv semantics mirror vocoder/bigvgan/models.py
resblock Conv1d (zero 'same' padding, dilation d); quantization itself has
no reference analogue (torch fp32 path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_per_tensor(x: jnp.ndarray):
    """x -> (int8 q, f32 scale) with symmetric per-tensor range."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-20) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_weight_per_cout(w: jnp.ndarray):
    """(k, C_in, C_out) -> (int8 q, (C_out,) f32 scales), symmetric."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1)), 1e-20) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_conv1d_cl(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                   dilation: int) -> jnp.ndarray:
    """(B, T, C_in) x (k, C_in, C_out) -> (B, T, C_out), 'same' zero padding.

    Matches `models.bigvgan._conv1d` semantics with dynamically-quantized
    int8 x int8 -> int32 tap dots on the MXU; the epilogue rescales by
    (activation scale x per-C_out weight scale) in f32 and adds the bias.
    """
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    out_len = x.shape[1]
    wq, wscale = quantize_weight_per_cout(w)
    xq, ascale = quantize_per_tensor(x)
    xq = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0)))
    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(xq, j * dilation, j * dilation + out_len, axis=1)
        term = jax.lax.dot_general(
            sl, wq[j], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = term if acc is None else acc + term
    y = acc.astype(jnp.float32) * (ascale * wscale) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
