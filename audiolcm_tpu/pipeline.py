"""End-to-end text-to-audio inference pipeline.

Parity target: the `AudioLCMInfer` call stack (SURVEY.md §3.1,
`pythonscripts/InferAPI.py:103` -> `scheduling_lcm.py` -> VAE decode ->
BigVGAN). The TPU redesign compiles the whole token-ids -> waveform path
into ONE jitted XLA program per (batch, duration-bucket) shape:

    clap_ids (B,77), t5_ids (B,77)
      -> BERT+projection (B,77,1024) | T5 (B,77,1024)  [frozen towers]
      -> concat -> (B,154,1024) context
      -> lax.scan LCM loop: S x ConcatDiT2MLP forward        (hot loop 1)
      -> latent / scale_factor -> VAE decode -> mel (B,T,80)
      -> BigVGAN x256 upsample -> wav (B, 256*T)             (hot loop 2)

Host work is only tokenization and the final device->host wav copy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.lcm import LCMConfig, lcm_sample
from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.clap_text import BertConfig, ClapTextEncoder
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig


@dataclasses.dataclass
class PipelineModules:
    """Model definitions (architecture only; params travel separately)."""

    dit: ConcatDiT2MLP
    vae: AutoencoderKL1D
    vocoder: BigVGAN
    clap_text: Optional[ClapTextEncoder] = None
    t5: Optional[T5Encoder] = None

    @classmethod
    def default(cls, with_text_encoders: bool = True) -> "PipelineModules":
        """Production configuration (configs/audiolcm.yaml)."""
        return cls(
            dit=ConcatDiT2MLP(),
            vae=AutoencoderKL1D(VAEConfig()),
            vocoder=BigVGAN(BigVGANConfig()),
            clap_text=ClapTextEncoder(BertConfig()) if with_text_encoders else None,
            t5=T5Encoder(T5Config()) if with_text_encoders else None,
        )


@dataclasses.dataclass
class PipelineParams:
    dit: Any
    vae: Any
    vocoder: Any
    clap_text: Any = None
    t5: Any = None
    # latent std rescale (`scale_by_std`, lcm_audio.py:123-138); stored in
    # the reference checkpoint as `scale_factor`.
    scale_factor: float = 1.0


class AudioLCMPipeline:
    """Holds modules + params and exposes jitted generate functions."""

    def __init__(
        self,
        modules: PipelineModules,
        params: PipelineParams,
        schedule: Optional[NoiseSchedule] = None,
        lcm_config: LCMConfig = LCMConfig(),
        default_latent_len: int = 312,
    ):
        self.modules = modules
        self.params = params
        self.schedule = schedule if schedule is not None else NoiseSchedule.linear()
        self.lcm_config = lcm_config
        # mel_length of the config (312 latent frames = 10 s at 62.5 mel fps / 2)
        self.default_latent_len = default_latent_len

    # -- text encoding ------------------------------------------------------

    def encode_text_ids(self, clap_ids: jnp.ndarray, t5_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids -> (B, 154, 1024) context (modules.py:567-582 parity:
        CLAP half first, T5 half second, no attention masks)."""
        z1 = self.modules.clap_text.apply({"params": self.params.clap_text}, clap_ids)
        z2 = self.modules.t5.apply({"params": self.params.t5}, t5_ids)
        return jnp.concatenate([z1, z2], axis=1)

    # -- stages -------------------------------------------------------------

    def denoise_fn(self, context: jnp.ndarray):
        def fn(x, t, w_emb):
            return self.modules.dit.apply(
                {"params": self.params.dit}, x, t, context, w_emb
            )

        return fn

    def sample_latent(
        self, rng: jax.Array, context: jnp.ndarray, latent_len: int
    ) -> jnp.ndarray:
        batch = context.shape[0]
        shape = (batch, latent_len, self.modules.dit.in_channels)
        return lcm_sample(
            self.denoise_fn(context), self.schedule, rng, shape, self.lcm_config
        )

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """LCM latent -> mel (B, T, 80); includes 1/scale_factor
        (`decode_first_stage`, lcm_audio.py:392-406)."""
        z = z / self.params.scale_factor
        return self.modules.vae.apply(
            {"params": self.params.vae}, z, method=AutoencoderKL1D.decode
        )

    def vocode(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.modules.vocoder.apply({"params": self.params.vocoder}, mel)

    # -- fused programs -----------------------------------------------------

    def generate_from_context(
        self, rng: jax.Array, context: jnp.ndarray, latent_len: int = 312
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(wav, mel) from a precomputed context embedding."""
        z = self.sample_latent(rng, context, latent_len)
        mel = self.decode_latent(z)
        return self.vocode(mel), mel

    def generate(
        self,
        rng: jax.Array,
        clap_ids: jnp.ndarray,
        t5_ids: jnp.ndarray,
        latent_len: int = 312,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        context = self.encode_text_ids(clap_ids, t5_ids)
        return self.generate_from_context(rng, context, latent_len)

    @functools.cached_property
    def generate_jit(self):
        """Jitted token-ids -> waveform program (static latent_len)."""
        return jax.jit(self.generate, static_argnums=(3,))

    @functools.cached_property
    def generate_from_context_jit(self):
        return jax.jit(self.generate_from_context, static_argnums=(2,))
