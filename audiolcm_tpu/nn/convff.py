"""Conv1d GEGLU feed-forward — the FLOP-dominant block of the DiT.

Behavior parity: `ldm/modules/new_attention.py:48-74` — a kernel-9 Conv1d
from dim -> 2*(mult*dim), GEGLU gating (erf GELU), then a kernel-9 Conv1d
back to dim. At hidden=576/mult=4 this is ~90% of backbone FLOPs.

TPU-first notes: channels-last (B, T, C) layout so the conv contraction is a
(T x 9C_in) x (9C_in x C_out) matmul on the MXU; XLA fuses the GEGLU gate
into the conv epilogue. The split order of the GEGLU halves matches torch's
`chunk(2, dim=channel)` so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Conv1dGEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    kernel_size: int = 9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        pad = self.kernel_size // 2
        h = nn.Conv(
            2 * inner,
            kernel_size=(self.kernel_size,),
            padding=[(pad, pad)],
            kernel_init=nn.initializers.xavier_uniform(),
            name="proj",
        )(x)
        val, gate = jnp.split(h, 2, axis=-1)
        h = val * jax.nn.gelu(gate, approximate=False)
        return nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            padding=[(pad, pad)],
            kernel_init=nn.initializers.xavier_uniform(),
            name="out",
        )(h)
