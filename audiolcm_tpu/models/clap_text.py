"""CLAP text tower: BERT-base encoder + residual-MLP projection to 1024-d.

Behavior parity: `ldm/modules/encoders/CLAP/clap.py:8-52` (TextEncoder =
HF bert-base-uncased + Projection) as used by FrozenCLAPFLANEmbedder
(`ldm/modules/encoders/modules.py:567-582`): the projection is applied to
the FULL last_hidden_state sequence (77 tokens), not the CLS vector, and —
faithfully to the reference — NO attention mask is passed, so padding
tokens are attended (`modules.py:578`).

This is a from-scratch Flax BERT encoder (not the HF Flax port): static
77-token sequences, channels-last matmuls, f32 softmax, erf GELU, LayerNorm
eps 1e-12 matching HF BertModel numerics. Weights come from the reference's
`CLAP_weights_2022.pth` via audiolcm_tpu.convert.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    config: BertConfig
    # fuse_proj=True runs Q/K/V as ONE matmul (params under "qkv"; see
    # fuse_bert_params). At serving shapes (B*77 rows) the towers are
    # small-matmul bound, so fewer/wider dots raise MXU utilization.
    fuse_proj: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_bias: Optional[jnp.ndarray]) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        b, t, _ = x.shape

        if self.fuse_proj:
            qkv = nn.Dense(3 * cfg.hidden_size, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(cfg.hidden_size, name="q")(x)
            k = nn.Dense(cfg.hidden_size, name="k")(x)
            v = nn.Dense(cfg.hidden_size, name="v")(x)
        split = lambda a: a.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k), preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        if mask_bias is not None:
            logits = logits + mask_bias
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        attn = nn.Dense(cfg.hidden_size, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(x + attn)

        h = nn.Dense(cfg.intermediate_size, name="ff_in")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="ff_out")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm")(x + h)


class BertEncoder(nn.Module):
    """input_ids (B, L) -> last_hidden_state (B, L, hidden)."""

    config: BertConfig = BertConfig()
    fuse_proj: bool = False

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.config
        b, t = input_ids.shape
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(input_ids)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        token_type = self.param(
            "token_type_embeddings",
            nn.initializers.normal(0.02),
            (cfg.type_vocab_size, cfg.hidden_size),
        )
        h = word + pos[None, :t, :] + token_type[0][None, None, :]
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_norm")(h)

        mask_bias = None
        if attention_mask is not None:
            mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        for i in range(cfg.num_layers):
            h = BertLayer(cfg, fuse_proj=self.fuse_proj, name=f"layer_{i}")(h, mask_bias)
        return h


def fuse_bert_params(bert_params):
    """Standard BertEncoder params -> the fuse_proj=True layout: each
    layer's q/k/v Dense merged into one "qkv" Dense (kernels concatenated
    along the output axis). Output-column blocks of one matmul reduce over
    K identically to the separate matmuls, so this is numerics-preserving."""
    out = {}
    for name, sub in bert_params.items():
        if name.startswith("layer_") and "q" in sub:
            sub = dict(sub)
            q, k, v = sub.pop("q"), sub.pop("k"), sub.pop("v")
            sub["qkv"] = {
                "kernel": jnp.concatenate(
                    [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                "bias": jnp.concatenate([q["bias"], k["bias"], v["bias"]]),
            }
        out[name] = sub
    return out


class Projection(nn.Module):
    """`CLAP/clap.py:8-20`: LN(linear1(x) + linear2(gelu(linear1(x))))."""

    d_out: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e1 = nn.Dense(self.d_out, use_bias=False, name="linear1")(x)
        e2 = nn.Dense(self.d_out, use_bias=False, name="linear2")(
            jax.nn.gelu(e1, approximate=False)
        )
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(e1 + e2)


class ClapTextEncoder(nn.Module):
    """BERT last_hidden_state -> per-token 1024-d projection (B, L, 1024)."""

    config: BertConfig = BertConfig()
    d_proj: int = 1024
    fuse_proj: bool = False

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        h = BertEncoder(self.config, fuse_proj=self.fuse_proj, name="bert")(
            input_ids, attention_mask
        )
        return Projection(self.d_proj, name="projection")(h)
