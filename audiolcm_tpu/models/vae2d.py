"""2D mel-as-image VAE (+ VQ variant) — Stable-Diffusion-style first stage.

Behavior parity: `ldm/models/autoencoder.py:15,306` with
`ldm/modules/diffusionmodules/model.py:368-606` (Encoder/Decoder): conv3x3
stem, per-resolution res-blocks with optional attention at configured
`attn_resolutions`, downsample at every level but the last (asymmetric
(0,1) pad + conv s2), symmetric decoder with nearest-2x upsample, mid-block
Res+Attn+Res, GroupNorm(32, eps 1e-6) + swish throughout. The repo imports
these for isinstance checks and older mel-as-(B,1,80,T)-image checkpoints
(SURVEY.md §2.4).

Channels-last NHWC; attention flattens H*W with scale C^-0.5.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv(features: int, k: int = 3, stride: int = 1, padding=None, name=None):
    if padding is None:
        padding = [(k // 2, k // 2), (k // 2, k // 2)]
    return nn.Conv(features, kernel_size=(k, k), strides=(stride, stride),
                   padding=padding, name=name)


class ResnetBlock2D(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.out_channels, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, k=1, name="nin_shortcut")(x)
        return x + h


class AttnBlock2D(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = _conv(c, 1, name="q")(h).reshape(b, hh * ww, c)
        k = _conv(c, 1, name="k")(h).reshape(b, hh * ww, c)
        v = _conv(c, 1, name="v")(h).reshape(b, hh * ww, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = nn.softmax(logits.astype(jnp.float32) * (c**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, hh, ww, c)
        return x + _conv(c, 1, name="proj_out")(out)


class Downsample2D(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID", name="conv")(x)


class Upsample2D(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(c, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VAE2DConfig:
    in_channels: int = 1
    out_ch: int = 1
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 80
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    dropout: float = 0.0


class Encoder2D(nn.Module):
    config: VAE2DConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = _conv(cfg.ch, name="conv_in")(x)
        curr_res = cfg.resolution
        for i, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock2D(block_out, cfg.dropout,
                                  name=f"down_{i}_block_{j}")(h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock2D(name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample2D(name=f"down_{i}_downsample")(h)
                curr_res //= 2
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = ResnetBlock2D(block_in, cfg.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock2D(name="mid_attn_1")(h)
        h = ResnetBlock2D(block_in, cfg.dropout, name="mid_block_2")(h, deterministic)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv(out_c, name="conv_out")(h)


class Decoder2D(nn.Module):
    config: VAE2DConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        n = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // (2 ** (n - 1))
        h = _conv(block_in, name="conv_in")(z)
        h = ResnetBlock2D(block_in, cfg.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock2D(name="mid_attn_1")(h)
        h = ResnetBlock2D(block_in, cfg.dropout, name="mid_block_2")(h, deterministic)
        for i in reversed(range(n)):
            block_out = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock2D(block_out, cfg.dropout,
                                  name=f"up_{i}_block_{j}")(h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock2D(name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample2D(name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(cfg.out_ch, name="conv_out")(h)


class AutoencoderKL2D(nn.Module):
    """Full 2D KL VAE with quant convs (`autoencoder.py:306-379`)."""

    config: VAE2DConfig = VAE2DConfig()

    def setup(self):
        from audiolcm_tpu.models.vae1d import DiagonalGaussian  # shared posterior

        cfg = self.config
        self.encoder = Encoder2D(cfg)
        self.decoder = Decoder2D(cfg)
        self.quant_conv = nn.Conv(2 * cfg.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), name="post_quant_conv")
        self._posterior_cls = DiagonalGaussian

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array, sample_posterior: bool = True):
        moments = self.encode_moments(x)
        posterior = self._posterior_cls(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantizer with straight-through gradients
    (`autoencoder.py:15-117` VQModel's quantize slot)."""

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        codebook = self.param(
            "embedding", nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        quantized = codebook[idx].reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2)
        codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(z)) ** 2)
        loss = codebook_loss + self.beta * commit
        quantized = z + jax.lax.stop_gradient(quantized - z)  # straight-through
        return quantized, loss, idx.reshape(z.shape[:-1])


class VQModel2D(nn.Module):
    """VQ first-stage interface (`autoencoder.py:15-305`)."""

    config: VAE2DConfig = VAE2DConfig(double_z=False)
    n_embed: int = 8192

    def setup(self):
        cfg = self.config
        self.encoder = Encoder2D(cfg)
        self.decoder = Decoder2D(cfg)
        self.quant_conv = nn.Conv(cfg.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), name="post_quant_conv")
        self.quantize = VectorQuantizer(self.n_embed, cfg.embed_dim)

    def encode(self, x: jnp.ndarray):
        h = self.quant_conv(self.encoder(x))
        return self.quantize(h)

    def decode(self, quant: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x: jnp.ndarray):
        quant, loss, idx = self.encode(x)
        return self.decode(quant), loss, idx
