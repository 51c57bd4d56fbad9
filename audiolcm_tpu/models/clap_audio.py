"""CLAP audio tower: Cnn14 (PANN) — used by the CLAP-score eval harness.

Behavior parity: `wav_evaluation/models/audio.py` / `ldm/modules/encoders/
CLAP/audio.py`: 44.1 kHz mono wav -> torchlibrosa power spectrogram
(hann, center=True, win=n_fft=1024, hop=320) -> 64-mel log filterbank
(power_to_db, amin 1e-10) -> BatchNorm over mel bins -> 6 ConvBlocks
(2x conv3x3-BN-ReLU + 2x2 avg-pool; last block pools 1x1) -> freq-mean,
time max+mean -> fc1 ReLU -> 2048-d embedding. Then the contrastive
Projection 2048->1024 (`CLAP/clap.py:22-40`). Dropout is eval-disabled.

Channels-last; BatchNorms run in inference mode off checkpoint running
stats (this tower is frozen — it only scores, never trains).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.dsp.mel import hann_window, mel_filterbank, stft_magnitude


@dataclasses.dataclass(frozen=True)
class ClapAudioConfig:
    sample_rate: int = 44100
    window_size: int = 1024
    hop_size: int = 320
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    out_emb: int = 2048
    classes_num: int = 527
    amin: float = 1e-10


def logmel_torchlibrosa(wav: jnp.ndarray, cfg: ClapAudioConfig) -> jnp.ndarray:
    """torchlibrosa Spectrogram+LogmelFilterBank parity: center=True reflect
    pad, |stft|^2, slaney mel, 10*log10(clip(., amin)). -> (B, T, mel)."""
    pad = cfg.window_size // 2
    y = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    window = jnp.asarray(hann_window(cfg.window_size))
    mag = stft_magnitude(y, window, cfg.window_size, cfg.hop_size, cfg.window_size)
    power = mag**2  # (B, F, T)
    melW = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.window_size, cfg.mel_bins, cfg.fmin, cfg.fmax)
    )
    mel = jnp.einsum("mf,bft->btm", melW, power)
    return 10.0 * jnp.log10(jnp.clip(mel, cfg.amin, None))


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool: int = 2) -> jnp.ndarray:
        for i in (1, 2):
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
        return x


class Cnn14(nn.Module):
    config: ClapAudioConfig = ClapAudioConfig()

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav (B, L) at 44.1 kHz -> embedding (B, out_emb)."""
        cfg = self.config
        x = logmel_torchlibrosa(wav, cfg)[..., None]  # (B, T, mel, 1)
        # reference bn0 normalizes across mel bins (transpose trick,
        # audio.py:155-157): features axis = mel
        x = jnp.transpose(x, (0, 1, 3, 2))  # (B, T, 1, mel)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn0")(x)
        x = jnp.transpose(x, (0, 1, 3, 2))  # (B, T, mel, 1)

        widths = (64, 128, 256, 512, 1024, 2048)
        for i, w in enumerate(widths):
            pool = 2 if i < len(widths) - 1 else 1
            x = ConvBlock(w, name=f"conv_block{i + 1}")(x, pool=pool)
        x = jnp.mean(x, axis=2)  # freq mean -> (B, T', C)
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # (B, C)
        x = nn.relu(nn.Dense(cfg.out_emb, name="fc1")(x))
        return x


class ClapAudioEncoder(nn.Module):
    """Cnn14 + contrastive projection to the 1024-d CLAP space."""

    config: ClapAudioConfig = ClapAudioConfig()
    d_proj: int = 1024

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        from audiolcm_tpu.models.clap_text import Projection

        emb = Cnn14(self.config, name="base")(wav)
        return Projection(self.d_proj, name="projection")(emb)


def convert_cnn14(sd: dict) -> dict:
    """HF/PANN torch state dict (base.* stripped) -> flax params+batch_stats."""

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
        )

    params: dict = {}
    stats: dict = {}
    p, s = bn("bn0")
    params["bn0"], stats["bn0"] = p, s
    for i in range(1, 7):
        blk_p: dict = {}
        blk_s: dict = {}
        for j in (1, 2):
            w = sd[f"conv_block{i}.conv{j}.weight"]  # (out, in, kh, kw)
            blk_p[f"conv{j}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
            bp, bs = bn(f"conv_block{i}.bn{j}")
            blk_p[f"bn{j}"], blk_s[f"bn{j}"] = bp, bs
        params[f"conv_block{i}"] = blk_p
        stats[f"conv_block{i}"] = blk_s
    params["fc1"] = {"kernel": sd["fc1.weight"].T, "bias": sd["fc1.bias"]}
    return {"params": params, "batch_stats": stats}
