"""T5-v1.1 encoder tower (structured-caption branch of the conditioner).

Behavior parity: HF `T5EncoderModel` for google/t5-v1_1-large as loaded by
FrozenCLAPFLANEmbedder (`ldm/modules/encoders/modules.py:548-549,581`):
24 layers, d_model=1024, d_ff=2816, 16 heads, d_kv=64, RMSNorm eps 1e-6,
gated-GELU feed-forward (tanh approximation / gelu_new), NO attention-logit
scaling (T5 folds 1/sqrt(d) into the weights), relative position bias
computed in layer 0 and shared by all layers. Like the reference call site,
no attention mask is applied (padded 77-token sequences attend everywhere,
`modules.py:581`).

TPU-first notes: the relative-position bucket matrix is a static numpy
constant per (fixed) sequence length, so the bias is one embedding gather
baked into the compiled graph; everything else is standard MXU matmul work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket matrix, (qlen, klen) int32. Static precompute."""
    context = np.arange(qlen)[:, None]
    memory = np.arange(klen)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    arel = np.abs(rel)
    max_exact = nb // 2
    is_small = arel < max_exact
    large = max_exact + (
        np.log(np.maximum(arel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out += np.where(is_small, arel, large)
    return out.astype(np.int32)


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        return (weight * x).astype(weight.dtype)


class T5Layer(nn.Module):
    config: T5Config
    # fuse_proj=True runs Q/K/V as ONE matmul ("qkv") and the gated FF's
    # wi_0/wi_1 as ONE matmul ("wi"); see fuse_t5_params. The towers are
    # small-matmul bound at 77-token serving shapes — fewer/wider dots.
    fuse_proj: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pos_bias: jnp.ndarray, mask_bias: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        b, t, _ = x.shape

        h = RMSNorm(cfg.layer_norm_epsilon, name="attn_norm")(x)
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, name=name)
        split = lambda a: a.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        if self.fuse_proj:
            q, k, v = (split(a) for a in
                       jnp.split(dense(3 * inner, "qkv")(h), 3, axis=-1))
        else:
            q, k, v = (split(dense(inner, n)(h)) for n in ("q", "k", "v"))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + pos_bias  # NOTE: no 1/sqrt(d) scaling (T5 semantics)
        if mask_bias is not None:
            logits = logits + mask_bias
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, inner)
        x = x + dense(cfg.d_model, "o")(attn)

        h = RMSNorm(cfg.layer_norm_epsilon, name="ff_norm")(x)
        if self.fuse_proj:
            wi0, wi1 = jnp.split(dense(2 * cfg.d_ff, "wi")(h), 2, axis=-1)
        else:
            wi0 = dense(cfg.d_ff, "wi_0")(h)
            wi1 = dense(cfg.d_ff, "wi_1")(h)
        h = jax.nn.gelu(wi0, approximate=True) * wi1  # gated gelu_new
        return x + dense(cfg.d_model, "wo")(h)


class T5Encoder(nn.Module):
    """input_ids (B, L) -> last_hidden_state (B, L, d_model)."""

    config: T5Config = T5Config()
    fuse_proj: bool = False

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.config
        t = input_ids.shape[1]
        h = nn.Embed(cfg.vocab_size, cfg.d_model, name="token_embedder")(input_ids)

        buckets = relative_position_buckets(
            t, t, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        rel_emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        pos_bias = jnp.transpose(rel_emb[jnp.asarray(buckets)], (2, 0, 1))[None]

        mask_bias = None
        if attention_mask is not None:
            mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

        for i in range(cfg.num_layers):
            h = T5Layer(cfg, fuse_proj=self.fuse_proj, name=f"layer_{i}")(
                h, pos_bias, mask_bias
            )
        return RMSNorm(cfg.layer_norm_epsilon, name="final_norm")(h)


def fuse_t5_params(params):
    """Standard T5Encoder params -> the fuse_proj=True layout: per layer,
    q/k/v kernels concatenated into "qkv" and wi_0/wi_1 into "wi" (output
    axis). Output-column blocks of one matmul reduce over K identically to
    the separate matmuls, so this is numerics-preserving."""
    out = {}
    for name, sub in params.items():
        if name.startswith("layer_") and "q" in sub:
            sub = dict(sub)
            q, k, v = sub.pop("q"), sub.pop("k"), sub.pop("v")
            sub["qkv"] = {"kernel": jnp.concatenate(
                [q["kernel"], k["kernel"], v["kernel"]], axis=1)}
            w0, w1 = sub.pop("wi_0"), sub.pop("wi_1")
            sub["wi"] = {"kernel": jnp.concatenate(
                [w0["kernel"], w1["kernel"]], axis=1)}
        out[name] = sub
    return out
