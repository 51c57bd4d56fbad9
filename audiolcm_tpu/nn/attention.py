"""Multi-head attention for the DiT backbone.

Behavior parity: `ldm/modules/new_attention.py:89-130` (CrossAttention with
no context == self-attention; q/k/v are bias-free projections, output has a
bias, softmax over keys, scale = head_dim**-0.5).

TPU-first notes: the whole op is a chain of (B*H, T, d) batched matmuls that
XLA tiles onto the MXU; softmax is computed in float32 regardless of the
activation dtype for numerical safety. Sequence lengths here are <=~1030
tokens (SURVEY.md §5.7), so a flash/blocked Pallas kernel is an optimization,
not a necessity — `fused_attention` below dispatches to the Pallas kernel in
audiolcm_tpu.nn.pallas_attention when enabled and safe.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """q: (B, H, Tq, d), k/v: (B, H, Tk, d) -> (B, H, Tq, d)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention over (B, T, C) with separate q/k/v projections.

    use_flash=True routes through the Pallas flash kernel
    (nn/pallas_attention.py) — TPU-compiled only; the default XLA einsum
    path is used for CPU tests and tiny shapes.

    fuse_qkv=True runs the three projections as ONE (C, 3*inner) matmul
    (params under "to_qkv"; see fuse_attention_params). The DiT's dots are
    small (hidden 576 at a few hundred tokens), so fewer/wider dispatches
    raise MXU utilization — same trick as the text towers' fuse_proj.
    Output-column blocks of one matmul reduce over K identically to the
    separate matmuls, so this is numerics-preserving.
    """

    num_heads: int
    head_dim: int
    use_flash: bool = False
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        dense = lambda name, width=None: nn.Dense(
            width or inner, use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )
        if self.fuse_qkv:
            qkv = dense("to_qkv", 3 * inner)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense("to_q")(x)
            k = dense("to_k")(x)
            v = dense("to_v")(x)

        b, t, _ = x.shape
        split = lambda a: a.reshape(b, t, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        if self.use_flash:
            import jax

            from audiolcm_tpu.nn.pallas_attention import flash_attention

            # interpret off-TPU so the flash path itself (not a silent einsum
            # substitute) is exercised by CPU tests like the serving error
            # budget; on TPU this is the compiled Mosaic kernel
            out = flash_attention(split(q), split(k), split(v),
                                  self.head_dim**-0.5,
                                  interpret=jax.default_backend() != "tpu")
        else:
            out = dot_product_attention(split(q), split(k), split(v), self.head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(
            x.shape[-1], kernel_init=nn.initializers.xavier_uniform(), name="to_out"
        )(out)


def fuse_attention_params(params):
    """Standard param tree -> the fuse_qkv=True layout: wherever a subtree is
    a MultiHeadSelfAttention (has to_q/to_k/to_v/to_out), the three bias-free
    kernels concatenate along the output axis into one "to_qkv" Dense.
    Numerics-preserving (see the class docstring); converted checkpoints
    stay knob-agnostic by applying this transform at load time."""
    keys = {"to_q", "to_k", "to_v", "to_out"}

    def walk(node):
        if isinstance(node, dict):
            if keys <= set(node.keys()):
                return {
                    "to_qkv": {
                        "kernel": jnp.concatenate(
                            [node["to_q"]["kernel"], node["to_k"]["kernel"],
                             node["to_v"]["kernel"]], axis=1)
                    },
                    "to_out": node["to_out"],
                }
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
