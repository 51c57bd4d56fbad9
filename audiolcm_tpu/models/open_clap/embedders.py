"""LAION-CLAP text embedders for the conditioning-stage registry.

Behavior parity: `ldm/modules/encoders/modules.py:242-341` —
FrozenLAIONCLAPEmbedder builds an HTSAT-tiny/roberta CLAP with
enable_fusion + aff_2d, drops the audio branch, and encodes text either
per-token (`text_projection(last_hidden_state)` -> (B, 77, 512)) or as a
single normalized sentence vector ((B, 1, 512), max_length 512 in the
Setence variant, :326-341).

TPU-first: tokenization is host-side (HF RobertaTokenizer from a local
dir); the encode core is one jitted params-closed function.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.open_clap.factory import create_model


class FrozenLAIONCLAPEmbedder:
    """modules.py:242-289. encode(texts) -> (B, max_length, 512) per-token
    projected features, or (B, 1, 512) normalized embedding if sentence."""

    def __init__(self, weights_path: str = "", sentence: bool = False,
                 max_length: int = 77,
                 tokenizer_path: str = "roberta-base",
                 amodel: str = "HTSAT-tiny", tmodel: str = "roberta"):
        self.sentence = sentence
        self.max_length = max_length
        self.model, self.config, params = create_model(
            amodel, tmodel, weights_path, enable_fusion=True,
            fusion_type="aff_2d")
        if params is not None:
            # audio branch deleted like the reference (modules.py:259)
            params["params"].pop("audio_branch", None)
            params["params"].pop("audio_transform", None)
            params["params"].pop("audio_projection", None)
            params.get("batch_stats", {}).pop("audio_branch", None)
        self.params = params
        self._tokenizer = None
        self._tokenizer_path = tokenizer_path

        model = self.model

        @jax.jit
        def _encode_tokens(p, input_ids, attention_mask):
            hidden = model.apply(p, input_ids, attention_mask, project=False,
                                 method=model.encode_text)
            return model.apply(p, hidden, method=model.project_token_features)

        @jax.jit
        def _encode_sentence(p, input_ids, attention_mask):
            return model.apply(p, input_ids, attention_mask,
                               method=model.get_text_embedding)

        self._encode_tokens = _encode_tokens
        self._encode_sentence = _encode_sentence

    def init_params(self, rng) -> dict:
        """Random init (for tests / synthetic weights)."""
        ids = jnp.zeros((1, self.max_length), jnp.int32)
        variables = self.model.init(rng, input_ids=ids,
                                    attention_mask=jnp.ones_like(ids),
                                    method=self.model.encode_text)
        self.params = variables
        return variables

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from transformers import RobertaTokenizer

            self._tokenizer = RobertaTokenizer.from_pretrained(
                self._tokenizer_path)
        return self._tokenizer

    def encode_ids(self, input_ids: jnp.ndarray,
                   attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if self.sentence:
            z = self._encode_sentence(self.params, input_ids, attention_mask)
            return z[:, None, :]
        return self._encode_tokens(self.params, input_ids, attention_mask)

    def encode(self, texts: Sequence[str]) -> jnp.ndarray:
        if self.model.config.text_model_type == "transformer":
            # CLIP text branch: the in-package BPE tokenizer (no HF asset),
            # `open_clap/tokenizer.py:152-180` semantics; the branch ignores
            # attention masks (causal tower, model.py:602-616)
            from audiolcm_tpu.models.open_clap.tokenizer import tokenize

            ids = tokenize(list(texts), self.max_length)
            return self.encode_ids(jnp.asarray(ids))
        batch = self.tokenizer(list(texts), truncation=True,
                               max_length=self.max_length,
                               padding="max_length", return_tensors="np")
        return self.encode_ids(jnp.asarray(batch["input_ids"]),
                               jnp.asarray(batch["attention_mask"]))


class FrozenLAIONCLAPSetenceEmbedder(FrozenLAIONCLAPEmbedder):
    """modules.py:291-341 (reference's spelling kept): always the sentence
    embedding, tokenized at max_length=512."""

    def __init__(self, weights_path: str = "",
                 tokenizer_path: str = "roberta-base", **kw):
        super().__init__(weights_path, sentence=True, max_length=512,
                         tokenizer_path=tokenizer_path, **kw)
