"""Full CLAP contrastive model (text + audio towers + temperature).

Behavior parity: `ldm/modules/encoders/CLAP/clap.py:54-88` /
`wav_evaluation/models/clap.py`: BERT-CLS text projection and
Cnn14 audio projection into the shared 1024-d space with a learned
logit-scale (config temperature 0.003 -> logit_scale init log(1/0.003)),
symmetric InfoNCE objective. Used for CLAP-score evaluation and for
fine-tuning the eval model; the generation path only needs the text tower
(models/clap_text.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.models.clap_audio import ClapAudioConfig, Cnn14
from audiolcm_tpu.models.clap_text import BertConfig, BertEncoder, Projection


class CLAP(nn.Module):
    text_config: BertConfig = BertConfig()
    audio_config: ClapAudioConfig = ClapAudioConfig()
    d_proj: int = 1024
    temperature: float = 0.003

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, wav: jnp.ndarray):
        """(B, L) token ids + (B, S) 44.1kHz wav -> (text_emb, audio_emb,
        logit_scale), embeddings L2-normalized in the shared space."""
        h = BertEncoder(self.text_config, name="caption_encoder_base")(input_ids)
        text = Projection(self.d_proj, name="caption_projection")(h[:, 0, :])
        a = Cnn14(self.audio_config, name="audio_encoder_base")(wav)
        audio = Projection(self.d_proj, name="audio_projection")(a)
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        audio = audio / jnp.linalg.norm(audio, axis=-1, keepdims=True)
        logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(math.log(1.0 / self.temperature), jnp.float32),
        )
        return text, audio, jnp.exp(logit_scale)


def clap_contrastive_loss(
    text_emb: jnp.ndarray, audio_emb: jnp.ndarray, logit_scale: jnp.ndarray
) -> jnp.ndarray:
    """Symmetric InfoNCE over the in-batch similarity matrix."""
    logits = logit_scale * text_emb @ audio_emb.T
    labels = jnp.arange(logits.shape[0])
    loss_t = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    loss_a = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    return 0.5 * (loss_t + loss_a)
