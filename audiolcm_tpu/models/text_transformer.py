"""Trainable from-scratch text encoder (BERTEmbedder / x_transformer slot).

Behavior parity target: `ldm/modules/encoders/modules.py:54-141`
(BERTTokenizer + BERTEmbedder over the lucidrains `x_transformer.py`
TransformerWrapper): a from-scratch token embedding + learned absolute
positions + pre-LN transformer encoder trained jointly with the diffusion
model (used by older Make-An-Audio configs; unused by the shipped AudioLCM
YAMLs). Implemented as a standard pre-LN encoder rather than a port of the
lucidrains feature zoo — the configs only exercise the vanilla path
(dim=1280, depth=32-style settings).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.attention import MultiHeadSelfAttention


class TransformerTextEncoder(nn.Module):
    vocab_size: int = 30522
    max_seq_len: int = 77
    dim: int = 1280
    depth: int = 8
    num_heads: int = 8
    mlp_mult: int = 4

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, L) token ids -> (B, L, dim) embeddings."""
        b, l = input_ids.shape
        h = nn.Embed(self.vocab_size, self.dim, name="token_emb")(input_ids)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (self.max_seq_len, self.dim)
        )
        h = h + pos[None, :l, :]
        head_dim = self.dim // self.num_heads
        for i in range(self.depth):
            a = MultiHeadSelfAttention(self.num_heads, head_dim, name=f"attn_{i}")(
                nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(h)
            )
            h = h + a
            ff = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(h)
            ff = nn.Dense(self.dim * self.mlp_mult, name=f"ff_in_{i}")(ff)
            ff = jax.nn.gelu(ff, approximate=False)
            ff = nn.Dense(self.dim, name=f"ff_out_{i}")(ff)
            h = h + ff
        return nn.LayerNorm(epsilon=1e-5, name="final_norm")(h)
