"""LAION open_clap CLAP model: audio + text branches, joint projections,
per-modality logit scales.

Behavior parity: `ldm/modules/encoders/open_clap/model.py:422-799` —
audio branch from `create_pann_model`/`create_htsat_model` (:463-470),
text branch transformer/bert/roberta (:473-537), `text_projection` and
`audio_projection` two-layer MLPs into joint_embed_shape=512 (:487-491,
:539-545), `MLPLayers` transforms (:27-45), logit scales init log(1/0.07)
(:548-549), `encode_text` (:602-648), `get_text_embedding` /
`get_audio_embedding` L2-normalized (:698-744), and the 6-tuple forward
(:650-693).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.open_clap.htsat import HTSAT, HTSATConfig, htsat_preset
from audiolcm_tpu.models.open_clap.pann import PannAudioBranch, PannConfig
from audiolcm_tpu.models.open_clap.text_towers import (
    BartConfig,
    BartEncoder,
    ClipTextTransformer,
    RobertaConfig,
    RobertaEncoder,
    clip_eot_features,
)
from audiolcm_tpu.models.clap_text import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class OpenClapConfig:
    embed_dim: int = 768  # audio branch output dim
    audio: Any = None  # HTSATConfig | PannConfig
    text_model_type: str = "roberta"  # 'roberta' | 'bert' | 'transformer'
    text_width: int = 512  # transformer branch only
    text_layers: int = 12
    text_heads: int = 8
    text_vocab: int = 49408
    context_length: int = 77
    joint_embed_shape: int = 512
    mlp_act: str = "relu"
    quick_gelu: bool = False


class MLPLayers(nn.Module):
    """model.py:27-45: (Linear + ReLU)* with last layer linear-only."""

    units: tuple = (512, 512, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pairs = list(zip(self.units[:-1], self.units[1:]))
        for i, (_, out) in enumerate(pairs):
            x = nn.Dense(out, name=f"linear_{i}")(x)
            if i < len(pairs) - 1:
                x = nn.relu(x)
        return x


class _Projection(nn.Module):
    """Linear -> act -> Linear into the joint space (model.py:487-491)."""

    out_dim: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, name="linear1")(x)
        x = nn.relu(x) if self.act == "relu" else nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, name="linear2")(x)


class OpenClap(nn.Module):
    config: OpenClapConfig = OpenClapConfig()

    def setup(self):
        cfg = self.config
        if isinstance(cfg.audio, HTSATConfig):
            self.audio_branch = HTSAT(cfg.audio, name="audio_branch")
        elif isinstance(cfg.audio, PannConfig):
            self.audio_branch = PannAudioBranch(cfg.audio, name="audio_branch")
        elif cfg.audio is not None:
            raise ValueError(f"unknown audio config {type(cfg.audio)}")
        if cfg.text_model_type == "roberta":
            self.text_branch = RobertaEncoder(RobertaConfig(),
                                              name="text_branch")
            text_out = 768
        elif cfg.text_model_type == "bert":
            self.text_branch = BertEncoder(BertConfig(), name="text_branch")
            text_out = 768
        elif cfg.text_model_type == "transformer":
            self.text_branch = ClipTextTransformer(
                width=cfg.text_width, layers=cfg.text_layers,
                heads=cfg.text_heads, vocab_size=cfg.text_vocab,
                context_length=cfg.context_length,
                quick_gelu=cfg.quick_gelu, name="text_branch")
            text_out = cfg.text_width
        elif cfg.text_model_type == "bart":
            self.text_branch = BartEncoder(BartConfig(), name="text_branch")
            text_out = 768
        else:
            raise ValueError(f"Model type {cfg.text_model_type} not found")
        del text_out
        j = cfg.joint_embed_shape
        self.text_projection = _Projection(j, cfg.mlp_act,
                                           name="text_projection")
        self.audio_projection = _Projection(j, cfg.mlp_act,
                                            name="audio_projection")
        self.text_transform = MLPLayers((j, j, j), name="text_transform")
        self.audio_transform = MLPLayers((j, j, j), name="audio_transform")
        self.logit_scale_a = self.param(
            "logit_scale_a", lambda *_: jnp.asarray(np.log(1 / 0.07)), ())
        self.logit_scale_t = self.param(
            "logit_scale_t", lambda *_: jnp.asarray(np.log(1 / 0.07)), ())

    def encode_text(self, input_ids: jnp.ndarray,
                    attention_mask: Optional[jnp.ndarray] = None,
                    project: bool = True) -> jnp.ndarray:
        """model.py:602-648. For roberta/bert: pooler_output -> projection.
        With project=False, returns the raw per-token hidden states (the
        FrozenLAIONCLAPEmbedder's non-sentence path projects those itself).
        """
        cfg = self.config
        if cfg.text_model_type == "transformer":
            feats = self.text_branch(input_ids)
            if not project:
                return feats
            return self.text_projection(clip_eot_features(feats, input_ids))
        if cfg.text_model_type == "roberta":
            hidden, pooled = self.text_branch(input_ids, attention_mask)
        elif cfg.text_model_type == "bart":
            # bart: UNMASKED mean of encoder_last_hidden_state
            # (model.py:637-643 torch.mean(..., axis=1))
            hidden = self.text_branch(input_ids, attention_mask)
            pooled = jnp.mean(hidden, axis=1)
        else:  # bert: reference takes pooler_output; our BertEncoder has no
            # pooler, reference CLAP ckpts for bert are unused — CLS stands in
            hidden = self.text_branch(input_ids, attention_mask)
            pooled = hidden[:, 0]
        if not project:
            return hidden
        return self.text_projection(pooled)

    def encode_audio(self, waveform: Optional[jnp.ndarray] = None,
                     mel_fusion: Optional[jnp.ndarray] = None,
                     longer: Optional[jnp.ndarray] = None) -> dict:
        return self.audio_branch(waveform=waveform, mel_fusion=mel_fusion,
                                 longer=longer)

    def get_text_embedding(self, input_ids, attention_mask=None):
        z = self.encode_text(input_ids, attention_mask)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def get_audio_embedding(self, waveform=None, mel_fusion=None, longer=None):
        emb = self.encode_audio(waveform, mel_fusion, longer)["embedding"]
        z = self.audio_projection(emb)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def project_token_features(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """text_projection applied per token (modules.py:287: the LAION
        embedder's non-sentence path)."""
        return self.text_projection(hidden)

    def __call__(self, waveform=None, mel_fusion=None, longer=None,
                 input_ids=None, attention_mask=None):
        """model.py:650-693: 6-tuple forward."""
        a = self.audio_projection(
            self.encode_audio(waveform, mel_fusion, longer)["embedding"])
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        t = self.encode_text(input_ids, attention_mask)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        return (a, t, self.audio_transform(a), self.text_transform(t),
                jnp.exp(self.logit_scale_a), jnp.exp(self.logit_scale_t))
