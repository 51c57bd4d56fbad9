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
Params are a pytree ARGUMENT of the jitted program (never closure
constants — baking ~1 GB of weights into the graph multiplies compile
time and bloats the executable).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.struct
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


@flax.struct.dataclass
class PipelineParams:
    """Parameter pytree: flows through jit as an argument."""

    dit: Any
    vae: Any
    vocoder: Any
    clap_text: Any = None
    t5: Any = None
    # latent std rescale (`scale_by_std`, lcm_audio.py:123-138); stored in
    # the reference checkpoint as `scale_factor`.
    scale_factor: float = 1.0


def cast_params(params: "PipelineParams", dtype) -> "PipelineParams":
    """Cast all float leaves (params are a pytree). bf16 halves HBM traffic
    and doubles MXU throughput at inference; keep an f32 master for training."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x  # python scalars (scale_factor) and integer leaves

    return jax.tree.map(cast, params)


class AudioLCMPipeline:
    """Holds modules + params and exposes jitted generate functions."""

    def __init__(
        self,
        modules: PipelineModules,
        params: PipelineParams,
        schedule: Optional[NoiseSchedule] = None,
        lcm_config: LCMConfig = LCMConfig(),
        default_latent_len: int = 312,
        compute_dtype=jnp.float32,
    ):
        self.modules = modules
        self.params = params
        self.schedule = schedule if schedule is not None else NoiseSchedule.linear()
        self.lcm_config = lcm_config
        # bf16 here + cast_params(params, bf16) = the fast serving config;
        # the LCM state/schedule math stays f32 inside lcm_sample.
        self.compute_dtype = compute_dtype
        # mel_length of the config (312 latent frames = 10 s at 62.5 mel fps / 2)
        self.default_latent_len = default_latent_len

        self._generate_ctx_jit = jax.jit(self._generate_from_context, static_argnums=(3,))
        self._generate_ids_jit = jax.jit(self._generate_from_ids, static_argnums=(4,))
        # (batch, latent_len) -> AOT-loaded generate executable
        # (api.prewarm_buckets); generate_jit prefers these, so a prewarmed
        # serving process never pays trace/lower/compile for lattice shapes.
        self._aot_execs: dict = {}

    # -- pure functions (params as explicit args) ---------------------------

    def _encode_text_ids(
        self, params: PipelineParams, clap_ids: jnp.ndarray, t5_ids: jnp.ndarray
    ) -> jnp.ndarray:
        """Token ids -> (B, 154, 1024) context (modules.py:567-582 parity:
        CLAP half first, T5 half second, no attention masks)."""
        z1 = self.modules.clap_text.apply({"params": params.clap_text}, clap_ids)
        z2 = self.modules.t5.apply({"params": params.t5}, t5_ids)
        return jnp.concatenate([z1, z2], axis=1)

    def _sample_latent(
        self, params: PipelineParams, rng: jax.Array, context: jnp.ndarray, latent_len: int
    ) -> jnp.ndarray:
        def denoise_fn(x, t, w_emb):
            return self.modules.dit.apply({"params": params.dit}, x, t, context, w_emb)

        batch = context.shape[0]
        shape = (batch, latent_len, self.modules.dit.in_channels)
        return lcm_sample(
            denoise_fn, self.schedule, rng, shape, self.lcm_config,
            dtype=self.compute_dtype,
        )

    def _decode_latent(self, params: PipelineParams, z: jnp.ndarray) -> jnp.ndarray:
        """LCM latent -> mel (B, T, 80); includes 1/scale_factor
        (`decode_first_stage`, lcm_audio.py:392-406)."""
        z = (z / params.scale_factor).astype(self.compute_dtype)
        return self.modules.vae.apply(
            {"params": params.vae}, z, method=AutoencoderKL1D.decode
        )

    def _generate_from_context(
        self, params: PipelineParams, rng: jax.Array, context: jnp.ndarray, latent_len: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self._sample_latent(params, rng, context, latent_len)
        mel = self._decode_latent(params, z)
        wav = self.modules.vocoder.apply({"params": params.vocoder}, mel)
        return wav.astype(jnp.float32), mel.astype(jnp.float32)

    def _generate_from_ids(
        self,
        params: PipelineParams,
        rng: jax.Array,
        clap_ids: jnp.ndarray,
        t5_ids: jnp.ndarray,
        latent_len: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        context = self._encode_text_ids(params, clap_ids, t5_ids)
        return self._generate_from_context(params, rng, context, latent_len)

    def _generate_teacher(
        self,
        params: PipelineParams,
        rng: jax.Array,
        context: jnp.ndarray,
        uncond: jnp.ndarray,
        latent_len: int,
        num_steps: int,
        guidance_scale: float,
        use_plms: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher path: 100-step DDIM/PLMS with batch-doubled CFG
        (`scripts/txt2audio_for_2cap.py:227-229` parity)."""
        from audiolcm_tpu.diffusion.ddim import DDIMConfig, ddim_sample
        from audiolcm_tpu.diffusion.plms import plms_sample

        def denoise_fn(x, t, ctx):
            return self.modules.dit.apply(
                {"params": params.dit}, x.astype(self.compute_dtype), t, ctx, None
            ).astype(jnp.float32)

        batch = context.shape[0]
        shape = (batch, latent_len, self.modules.dit.in_channels)
        cfg = DDIMConfig(num_steps=num_steps, guidance_scale=guidance_scale)
        sampler = plms_sample if use_plms else ddim_sample
        z = sampler(denoise_fn, self.schedule, rng, shape, context, uncond, cfg)
        mel = self._decode_latent(params, z)
        wav = self.modules.vocoder.apply({"params": params.vocoder}, mel)
        return wav.astype(jnp.float32), mel.astype(jnp.float32)

    # -- public API (bound to self.params) ----------------------------------

    def encode_text_ids(self, clap_ids: jnp.ndarray, t5_ids: jnp.ndarray) -> jnp.ndarray:
        return self._encode_text_ids(self.params, clap_ids, t5_ids)

    def sample_latent(self, rng, context, latent_len: int) -> jnp.ndarray:
        return self._sample_latent(self.params, rng, context, latent_len)

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        return self._decode_latent(self.params, z)

    def vocode(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.modules.vocoder.apply({"params": self.params.vocoder}, mel)

    def generate_from_context(self, rng, context, latent_len: int = 312):
        return self._generate_from_context(self.params, rng, context, latent_len)

    def generate(self, rng, clap_ids, t5_ids, latent_len: int = 312):
        return self._generate_from_ids(self.params, rng, clap_ids, t5_ids, latent_len)

    def generate_jit(self, rng, clap_ids, t5_ids, latent_len: int = 312):
        """Jitted token-ids -> waveform program (static latent_len).

        Prefers an AOT-loaded executable for this (batch, latent_len) when
        api.prewarm_buckets registered one — a prewarmed serving process
        skips trace+lower+compile entirely for every lattice shape."""
        # Keyed on every aval the loaded executable bakes in — batch, token
        # length, id dtype, latent_len (ADVICE r4 #1: a (batch, latent)-only
        # key made a 99-token or int64-id call hit a 77-token executable and
        # fail at call time instead of falling through to the jit path).
        key = (clap_ids.shape, t5_ids.shape, str(clap_ids.dtype),
               str(t5_ids.dtype), latent_len)
        ex = self._aot_execs.get(key)
        if ex is not None:
            return ex(self.params, rng, clap_ids, t5_ids)
        return self._generate_ids_jit(self.params, rng, clap_ids, t5_ids, latent_len)

    def generate_from_context_jit(self, rng, context, latent_len: int = 312):
        return self._generate_ctx_jit(self.params, rng, context, latent_len)

    def generate_teacher(
        self, rng, context, uncond, latent_len: int = 312,
        num_steps: int = 100, guidance_scale: float = 5.0, use_plms: bool = False,
    ):
        if not hasattr(self, "_teacher_jit"):
            self._teacher_jit = jax.jit(
                self._generate_teacher, static_argnums=(4, 5, 6, 7)
            )
        return self._teacher_jit(
            self.params, rng, context, uncond, latent_len, num_steps,
            guidance_scale, use_plms,
        )
