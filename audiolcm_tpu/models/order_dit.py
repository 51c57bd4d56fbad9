"""Order-conditioned DiT variants (temporal-order structured captions).

Behavior parity: `concatDiT.py:306-502` (ConcatOrderDiT / ConcatOrderDiT2).
The reference walks python lists of token ids per batch element at forward
time (`add_order_embedding` :350-372, `concat_order_embedding` :446-476) —
host-side, data-dependent work that cannot live in an XLA graph. The
TPU-native split:

  * host: `compute_order_indices` / `compute_order_insertion` turn token
    ids + per-sample order lists into STATIC-SHAPE integer tensors
    (order index per token, or a gather map for the token-inserted layout)
  * device: the model adds/gathers order embeddings with one embedding
    lookup — pure tensor ops, shape-static.

Token-id conventions follow the reference's BERT tokenizer assumptions
(`concatDiT.py:363`): 101=<start>, 102=<eos>, 0=<pad>, 1064='|' separator.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.dit import (
    ConditionEmbedder,
    TemporalTransformer,
    TimestepEmbedder,
    _xavier,
)

SPECIAL_IDS = (101, 102, 0, 1064)
SEP_ID = 1064


def compute_order_indices(token_ids: np.ndarray, orders: List[List[int]]) -> np.ndarray:
    """(B, L) token ids + per-sample order lists -> (B, L) int32 order index
    per token (-1 for specials/pad). `add_order_embedding` parity: tokens
    between '|' separators share the current object's order id."""
    b, l = token_ids.shape
    out = np.full((b, l), -1, dtype=np.int32)
    for bi in range(b):
        cur = 0
        orderl = orders[bi]
        for i in range(l):
            tid = int(token_ids[bi, i])
            if tid in SPECIAL_IDS:
                if tid == SEP_ID:
                    cur += 1
                continue
            if cur < len(orderl):
                out[bi, i] = orderl[cur]
    return out


def compute_order_insertion(
    token_ids: np.ndarray, orders: List[List[int]], max_objs: int = 10,
    pad_order: int = 100,
) -> Tuple[np.ndarray, np.ndarray]:
    """ConcatOrderDiT2 parity: order tokens are INSERTED at each '|'.

    Returns (src, order_id), both (B, L + max_objs) int32:
      * src[b, j]  >= 0: output token j gathers caption-token embedding src
      * src[b, j]  == -1: output token j is the order embedding order_id[b, j]
    """
    b, l = token_ids.shape
    out_len = l + max_objs
    src = np.full((b, out_len), -1, dtype=np.int32)
    oid = np.full((b, out_len), pad_order, dtype=np.int32)
    for bi in range(b):
        orderl = list(orders[bi])
        j = 0
        seen = 0
        for i in range(l):
            if int(token_ids[bi, i]) == SEP_ID and seen < len(orderl):
                src[bi, j] = -1
                oid[bi, j] = orderl[seen]
                seen += 1
                j += 1
            src[bi, j] = i
            j += 1
        while j < out_len:
            src[bi, j] = -1
            oid[bi, j] = pad_order
            j += 1
    return src, oid


class ConcatOrderDiT(nn.Module):
    """Order embedding ADDED to caption-token embeddings (`:306-398`)."""

    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 576
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1000
    num_orders: int = 100

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, in_ch)
        t: jnp.ndarray,
        token_embedding: jnp.ndarray,  # (B, L, ctx_dim)
        order_index: jnp.ndarray,  # (B, L) int32, -1 = no order
        w_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        t_tok = TimestepEmbedder(self.hidden_size, name="t_embedder")(t, w_cond)[:, None, :]
        c = ConditionEmbedder(self.hidden_size, name="c_embedder")(token_embedding)
        order_emb = nn.Embed(self.num_orders, self.hidden_size, name="order_embedding")
        safe = jnp.maximum(order_index, 0)
        c = c + jnp.where(
            (order_index >= 0)[..., None], order_emb(safe), 0.0
        )
        extra_len = c.shape[1] + 1
        h = nn.Conv(self.hidden_size, kernel_size=(5,), padding=[(2, 2)],
                    kernel_init=_xavier, name="proj_in")(x)
        # cast the f32 timestep token to the stream dtype (see dit.py:
        # unchecked it promotes the whole backbone to f32)
        h = jnp.concatenate([t_tok.astype(h.dtype), c.astype(h.dtype), h], axis=1)
        pos = self.param("pos_emb", nn.initializers.xavier_normal(),
                         (self.max_len, self.hidden_size))
        h = h + pos[None, : h.shape[1], :]
        for i in range(self.depth):
            h = TemporalTransformer(self.hidden_size, self.num_heads,
                                    name=f"blocks_{i}")(h)
        h = h[:, extra_len:, :]
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="final_norm")(h)
        return nn.Dense(self.in_channels, kernel_init=_xavier, name="final_conv")(h)


class ConcatOrderDiT2(nn.Module):
    """Order tokens INSERTED into the caption sequence (`:400-502`)."""

    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 576
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1000
    num_orders: int = 101  # 100 + pad slot

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        token_embedding: jnp.ndarray,  # (B, L, ctx_dim)
        src: jnp.ndarray,  # (B, L+max_objs) gather map, -1 = order token
        order_id: jnp.ndarray,  # (B, L+max_objs)
        w_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        t_tok = TimestepEmbedder(self.hidden_size, name="t_embedder")(t, w_cond)[:, None, :]
        c = ConditionEmbedder(self.hidden_size, name="c_embedder")(token_embedding)
        order_emb = nn.Embed(self.num_orders, self.hidden_size, name="order_embedding")
        gathered = jnp.take_along_axis(
            c, jnp.maximum(src, 0)[..., None], axis=1
        )
        c = jnp.where((src >= 0)[..., None], gathered, order_emb(order_id))
        extra_len = c.shape[1] + 1
        h = nn.Conv(self.hidden_size, kernel_size=(5,), padding=[(2, 2)],
                    kernel_init=_xavier, name="proj_in")(x)
        # cast the f32 timestep token to the stream dtype (see dit.py:
        # unchecked it promotes the whole backbone to f32)
        h = jnp.concatenate([t_tok.astype(h.dtype), c.astype(h.dtype), h], axis=1)
        pos = self.param("pos_emb", nn.initializers.xavier_normal(),
                         (self.max_len, self.hidden_size))
        h = h + pos[None, : h.shape[1], :]
        for i in range(self.depth):
            h = TemporalTransformer(self.hidden_size, self.num_heads,
                                    name=f"blocks_{i}")(h)
        h = h[:, extra_len:, :]
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="final_norm")(h)
        return nn.Dense(self.in_channels, kernel_init=_xavier, name="final_conv")(h)
