"""Pallas flash-attention kernel for the DiT self-attention.

The reference materializes the full (B*H, T, T) score matrix in HBM
(`new_attention.py:117-128`). At the production sequence length
(1 + 154 + 312 = 467 tokens) that is affordable, but it wastes HBM
bandwidth: this kernel computes attention block-wise in VMEM with the
online-softmax recurrence, so the T^2 logits never leave the chip and the
epilogue fuses. Also the building block for longer duration buckets
(up to 1000 latent frames, SURVEY.md §5.7) where 2*T^2 matrices start to
hurt.

Layout: q,k,v (B, H, T, D). T is padded to the 128-lane block grid; tail
keys are masked with -inf before the softmax. D (72 for the 576/8 config)
rides the lane axis zero-padded to 128 by Mosaic.

Falls back to the XLA einsum path on CPU (interpret mode covers tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                  num_k_blocks: int):
    """Grid: (batch*heads, num_q_blocks). Refs are (BLOCK, D) slices."""
    q = q_ref[:].astype(jnp.float32) * scale  # (BLOCK_Q, D)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_K)
        # mask keys beyond the real sequence length
        col = kb * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < seq_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((BLOCK_Q, d), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k,v: (B, H, T, D) -> (B, H, T, D). Softmax over keys in f32."""
    b, h, t, d = q.shape
    t_pad = _round_up(t, max(BLOCK_Q, BLOCK_K))
    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
    qp = jnp.pad(q, pad).reshape(b * h, t_pad, d)
    kp = jnp.pad(k, pad).reshape(b * h, t_pad, d)
    vp = jnp.pad(v, pad).reshape(b * h, t_pad, d)

    num_q_blocks = t_pad // BLOCK_Q
    num_k_blocks = t_pad // BLOCK_K
    kernel = functools.partial(
        _flash_kernel, scale=scale, seq_len=t, num_k_blocks=num_k_blocks
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec((None, BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, t_pad, d)[:, :, :t, :]


def attention_auto(q, k, v, scale: float) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA einsum elsewhere."""
    platform = q.devices().pop().platform if hasattr(q, "devices") else jax.default_backend()
    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v, scale)
    from audiolcm_tpu.nn.attention import dot_product_attention

    return dot_product_attention(q, k, v, scale)
