"""open_clap text branches: RoBERTa, BERT (pooler) and the CLIP-style
causal transformer.

Behavior parity:
  * roberta/bert branches: HF encoder + pooler_output consumed by
    `CLAP.encode_text` (`open_clap/model.py:617-635`). The RoBERTa
    encoder reuses our HF-exact BERT layers (models/clap_text.py) with
    RoBERTa's deltas: padding-aware position ids offset by padding_idx=1,
    vocab 50265, LayerNorm eps 1e-5, single token type.
  * 'transformer' branch: CLIP text tower — token embedding + learned
    positional embedding, pre-LN residual attention blocks with a causal
    mask (`model.py:259-303,581-587`), ln_final, features taken at the
    argmax (EOT) token (`model.py:602-616`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.models.clap_text import BertConfig, BertLayer


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5


class RobertaEncoder(nn.Module):
    """input_ids (B, L) -> (last_hidden_state, pooler_output)."""

    config: RobertaConfig = RobertaConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        bert_cfg = BertConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=1, layer_norm_eps=cfg.layer_norm_eps)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        name="word_embeddings")(input_ids)
        pos_table = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size))
        token_type = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (1, cfg.hidden_size))
        # RoBERTa position ids: cumsum over non-pad tokens + padding_idx
        pad_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(pad_mask, axis=1) * pad_mask + cfg.pad_token_id
        h = word + pos_table[position_ids] + token_type[0][None, None, :]
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_norm")(h)

        mask_bias = None
        if attention_mask is not None:
            mask_bias = (1.0 - attention_mask[:, None, None, :].astype(
                jnp.float32)) * -1e9
        for i in range(cfg.num_layers):
            h = BertLayer(bert_cfg, name=f"layer_{i}")(h, mask_bias)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, name="pooler")(h[:, 0]))
        return h, pooled


class ClipTextTransformer(nn.Module):
    """CLIP text tower (model.py:285-303 Transformer + embedding plumbing
    in CLAP.__init__/encode_text). Returns per-token features after
    ln_final; the caller picks the EOT token."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        if text_ids.shape[1] > self.context_length:
            raise ValueError(
                f"sequence length {text_ids.shape[1]} exceeds the CLIP text "
                f"tower's context_length {self.context_length}; the 512-token "
                "sentence embedder requires the roberta branch")
        tok = nn.Embed(self.vocab_size, self.width,
                       name="token_embedding")(text_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok + pos[None, : text_ids.shape[1]]
        t = text_ids.shape[1]
        causal = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)  # model.py:581-587

        act = ((lambda v: v * nn.sigmoid(1.702 * v)) if self.quick_gelu
               else (lambda v: nn.gelu(v, approximate=False)))
        hd = self.width // self.heads
        for i in range(self.layers):
            # pre-LN residual attention block (model.py:259-283)
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln_1_{i}")(x)
            qkv = nn.Dense(3 * self.width, name=f"attn_in_{i}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, tt, _ = q.shape
            sp = lambda a: a.reshape(b, tt, self.heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", sp(q), sp(k),
                                preferred_element_type=jnp.float32) * hd**-0.5
            logits = logits + causal[None, None]
            w = nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, sp(v))
            attn = attn.transpose(0, 2, 1, 3).reshape(b, tt, self.width)
            x = x + nn.Dense(self.width, name=f"attn_out_{i}")(attn)
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln_2_{i}")(x)
            y = nn.Dense(4 * self.width, name=f"mlp_fc_{i}")(y)
            y = act(y)
            x = x + nn.Dense(self.width, name=f"mlp_proj_{i}")(y)
        return nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)


def clip_eot_features(features: jnp.ndarray, text_ids: jnp.ndarray) -> jnp.ndarray:
    """Take features at the EOT token = argmax id per row (model.py:615)."""
    eot = jnp.argmax(text_ids, axis=-1)
    return jax.vmap(lambda f, i: f[i])(features, eot)


@dataclasses.dataclass(frozen=True)
class BartConfig:
    """facebook/bart-base encoder constants (the reference's `bart` branch
    loads exactly this preset, `open_clap/model.py:515-524`)."""

    vocab_size: int = 50265
    d_model: int = 768
    num_layers: int = 6
    num_heads: int = 12
    ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    pad_token_id: int = 1
    pos_offset: int = 2  # HF BartLearnedPositionalEmbedding offset
    layer_norm_eps: float = 1e-5


class BartEncoder(nn.Module):
    """BART encoder, HF-exact: learned positions at arange(L)+2,
    layernorm_embedding, POST-LN residual blocks (unlike the pre-LN CLIP
    tower above) with exact-gelu FFN. input_ids (B, L) ->
    encoder_last_hidden_state (B, L, d_model); the reference's bart branch
    consumes its unmasked mean (`model.py:637-643`)."""

    config: BartConfig = BartConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed_tokens")(input_ids)
        pos_table = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings + cfg.pos_offset, cfg.d_model))
        t = input_ids.shape[1]
        h = tok + pos_table[cfg.pos_offset: cfg.pos_offset + t][None]
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_embedding")(h)

        bias = None
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        hd = cfg.d_model // cfg.num_heads
        for i in range(cfg.num_layers):
            # self-attn then POST layer norm (HF BartEncoderLayer)
            q = nn.Dense(cfg.d_model, name=f"q_{i}")(h) * hd**-0.5
            k = nn.Dense(cfg.d_model, name=f"k_{i}")(h)
            v = nn.Dense(cfg.d_model, name=f"v_{i}")(h)
            b, tt, _ = q.shape
            sp = lambda a: a.reshape(b, tt, cfg.num_heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", sp(q), sp(k),
                                preferred_element_type=jnp.float32)
            if bias is not None:
                logits = logits + bias
            w = nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", w, sp(v))
            attn = attn.transpose(0, 2, 1, 3).reshape(b, tt, cfg.d_model)
            h = h + nn.Dense(cfg.d_model, name=f"attn_out_{i}")(attn)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"self_attn_layer_norm_{i}")(h)
            y = nn.Dense(cfg.ffn_dim, name=f"fc1_{i}")(h)
            y = nn.gelu(y, approximate=False)
            h = h + nn.Dense(cfg.d_model, name=f"fc2_{i}")(y)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"final_layer_norm_{i}")(h)
        return h
