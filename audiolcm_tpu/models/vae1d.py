"""1D mel VAE (first stage): mel (B, T, 80) <-> latent (B, T/2, 20).

Behavior parity: `ldm/models/autoencoder1d.py` with
configs/autoencoder1d.yaml / audiolcm.yaml:48-72: ch=384, ch_mult=(1,2,4),
num_res_blocks=2, down_layers=[0], attn_layers=[3] (which never matches a
level index, so the only attention is the mid-block), encoder kernel_size=5,
double_z, z_channels=20, embed_dim=20.

Faithfully reproduced quirks:
  * Decoder res-blocks use kernel 3 (Decoder1D does not forward kernel_size
    to its ResnetBlock1D calls, `autoencoder1d.py:444-464`), while the
    decoder's conv_in/conv_out use the configured kernel 5.
  * Mid-block attention scale is channels**-0.5 (`autoencoder1d.py:265-269`;
    the variable is named `t` but holds the channel count).
  * Upsampling is nearest-2x + conv k3; downsampling pads (0,1) then conv
    k3 stride 2 (`autoencoder1d.py:280-317`).

TPU-first notes: channels-last (B, T, C) throughout so every Conv1d is an
MXU matmul with C on the lane axis; encode/decode are separate jitted
functions; GroupNorm+SiLU fuse into the conv epilogue under XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv(features: int, kernel: int, name: str, stride: int = 1, padding=None):
    if padding is None:
        pad = kernel // 2
        padding = [(pad, pad)]
    return nn.Conv(
        features, kernel_size=(kernel,), strides=(stride,), padding=padding, name=name
    )


class ResnetBlock1D(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, self.kernel_size, "conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.out_channels, self.kernel_size, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, "nin_shortcut")(x)
        return x + h


class AttnBlock1D(nn.Module):
    """Mid-block single-head attention over time (`autoencoder1d.py:237-278`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = _conv(channels, 1, "q")(h)
        k = _conv(channels, 1, "k")(h)
        v = _conv(channels, 1, "v")(h)
        logits = jnp.einsum("btc,bsc->bts", q, k, preferred_element_type=jnp.float32)
        logits = logits * (channels**-0.5)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        h = jnp.einsum("bts,bsc->btc", attn, v)
        h = _conv(channels, 1, "proj_out")(h)
        return x + h


class Downsample1D(nn.Module):
    """Pad (0,1) then conv k3 stride 2 (`autoencoder1d.py:298-317`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        return nn.Conv(
            channels, kernel_size=(3,), strides=(2,), padding="VALID", name="conv"
        )(x)


class Upsample1D(nn.Module):
    """Nearest-2x then conv k3 (`autoencoder1d.py:280-295`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        x = jnp.repeat(x, 2, axis=1)
        return _conv(channels, 3, "conv")(x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig of configs/autoencoder1d.yaml."""

    in_channels: int = 80
    out_ch: int = 80
    ch: int = 384
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_layers: Sequence[int] = (3,)
    down_layers: Sequence[int] = (0,)
    kernel_size: int = 5
    z_channels: int = 20
    embed_dim: int = 20
    double_z: bool = True
    dropout: float = 0.0

    @property
    def downsample_factor(self) -> int:
        return 2 ** len(self.down_layers)


class Encoder1D(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        k = cfg.kernel_size
        h = _conv(cfg.ch, k, "conv_in")(x)
        for i_level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock1D(
                    block_out, k, cfg.dropout, name=f"down_{i_level}_block_{i_block}"
                )(h, deterministic)
                if i_level in cfg.attn_layers:
                    h = AttnBlock1D(name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level in cfg.down_layers:
                h = Downsample1D(name=f"down_{i_level}_downsample")(h)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = ResnetBlock1D(block_in, k, cfg.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock1D(name="mid_attn_1")(h)
        h = ResnetBlock1D(block_in, k, cfg.dropout, name="mid_block_2")(h, deterministic)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv(out_ch, k, "conv_out")(h)


class Decoder1D(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        num_layers = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        up_layers = [i + 1 for i in cfg.down_layers]
        h = _conv(block_in, cfg.kernel_size, "conv_in")(z)
        # decoder res blocks use the default kernel 3 (see module docstring)
        h = ResnetBlock1D(block_in, 3, cfg.dropout, name="mid_block_1")(h, deterministic)
        h = AttnBlock1D(name="mid_attn_1")(h)
        h = ResnetBlock1D(block_in, 3, cfg.dropout, name="mid_block_2")(h, deterministic)
        for i_level in reversed(range(num_layers)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock1D(
                    block_out, 3, cfg.dropout, name=f"up_{i_level}_block_{i_block}"
                )(h, deterministic)
                if i_level in cfg.attn_layers:
                    h = AttnBlock1D(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level in up_layers:
                h = Upsample1D(name=f"up_{i_level}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(cfg.out_ch, cfg.kernel_size, "conv_out")(h)


class DiagonalGaussian:
    """Posterior from concatenated [mean | logvar] moments
    (`ldm/modules/distributions/distributions.py:24-64`)."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=list(range(1, self.mean.ndim)),
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=list(range(1, self.mean.ndim)),
        )


class AutoencoderKL1D(nn.Module):
    """Full VAE with quant convs (`autoencoder1d.py:18-71`). (B, T, C) layout."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder1D(self.config)
        self.decoder = Decoder1D(self.config)
        cfg = self.config
        self.quant_conv = _conv(2 * cfg.embed_dim, 1, "quant_conv")
        self.post_quant_conv = _conv(cfg.z_channels, 1, "post_quant_conv")

    def encode_moments(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = self.encoder(x, deterministic)
        return self.quant_conv(h)

    def decode(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def __call__(
        self, x: jnp.ndarray, rng: jax.Array, sample_posterior: bool = True
    ) -> Tuple[jnp.ndarray, DiagonalGaussian]:
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
