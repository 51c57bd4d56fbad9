"""open_clap PANN audio branches (Cnn14 / Cnn10 / Cnn6) with feature fusion.

Behavior parity: `ldm/modules/encoders/open_clap/pann_model.py` —
ConvBlock double-3x3 (:32-76), ConvBlock5x5 (:78-113), Cnn14 (:146-331,
channels 64..2048, fc1 2048), Cnn10 (:428-522, channels 64..1024, fc1 1024),
Cnn6 (:333-426, 5x5 blocks 64..512, fc1 512), each returning
{'clipwise_output', 'embedding', 'fine_grained_embedding'}; optional fusion
variants: 'channel_map' (4-channel stem), 1D mel conv fusion before the
stem (:244-264), and 2D fusion after conv_block1 (:274-297).

Differs from `audiolcm_tpu/models/clap_audio.py` (the MS-CLAP Cnn14 used by
the shipped text encoder): these are the LAION-CLAP 48 kHz towers with the
fine-grained/latent head. Channels-last, eval mode (dropout/SpecAugment are
train-only in the reference and omitted); "longer" selection is a static
`jnp.where` blend instead of boolean indexing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from audiolcm_tpu.models.clap_audio import ClapAudioConfig, logmel_torchlibrosa
from audiolcm_tpu.models.open_clap.fusion import AFF, daf, iAFF


@dataclasses.dataclass(frozen=True)
class PannConfig:
    model_name: str = "Cnn14"  # Cnn14 | Cnn10 | Cnn6
    sample_rate: int = 48000
    window_size: int = 1024
    hop_size: int = 480
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    classes_num: int = 527
    enable_fusion: bool = False
    fusion_type: str = "None"

    @property
    def emb_dim(self) -> int:
        return {"Cnn14": 2048, "Cnn10": 1024, "Cnn6": 512}[self.model_name]


class ConvBlock(nn.Module):
    """Double 3x3 conv + BN + ReLU (pann_model.py:32-76)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool: int = 2) -> jnp.ndarray:
        for i in (1, 2):
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
        return x


class ConvBlock5x5(nn.Module):
    """Single 5x5 conv + BN + ReLU (pann_model.py:78-113)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool: int = 2) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (5, 5), padding=[(2, 2), (2, 2)],
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
        return x


def _pool1d_same(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """k3 s1 p1 max/avg pool over time of (B, T, C)
    (pann_model.py:313-316)."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0)),
                  constant_values=-jnp.inf if kind == "max" else 0.0)
    stack = jnp.stack([pad[:, :-2], pad[:, 1:-1], pad[:, 2:]], axis=0)
    if kind == "max":
        return jnp.max(stack, axis=0)
    # torch avg_pool1d with count_include_pad=True divides by k
    return jnp.sum(stack, axis=0) / 3.0


class PannAudioBranch(nn.Module):
    """Waveform (B, samples) or mel_fusion (B, 4, T, mel) + longer (B,) ->
    output dict (pann_model.py Cnn14/Cnn10/Cnn6 forward)."""

    config: PannConfig = PannConfig()

    @nn.compact
    def __call__(self, waveform: Optional[jnp.ndarray] = None,
                 mel_fusion: Optional[jnp.ndarray] = None,
                 longer: Optional[jnp.ndarray] = None) -> dict:
        cfg = self.config
        acfg = ClapAudioConfig(
            sample_rate=cfg.sample_rate, window_size=cfg.window_size,
            hop_size=cfg.hop_size, mel_bins=cfg.mel_bins, fmin=cfg.fmin,
            fmax=cfg.fmax)
        bn0 = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn0")
        if mel_fusion is not None:
            mel_all = bn0(mel_fusion)
            mel = mel_all[:, 0]
        else:
            mel = bn0(logmel_torchlibrosa(waveform, acfg))
            mel_all = None

        if cfg.enable_fusion and cfg.fusion_type in (
                "daf_1d", "aff_1d", "iaff_1d") and mel_all is not None:
            b, _, t, f = mel_all.shape
            loc = mel_all[:, 1:].reshape(b * 3, t, f)
            loc = nn.Conv(64, (5,), strides=(3,), padding=[(2, 2)],
                          name="mel_conv1d")(loc)
            loc = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                               name="mel_conv1d_bn")(loc)
            tp = loc.shape[1]
            loc = loc.reshape(b, 3, tp, f).transpose(0, 3, 1, 2)
            loc = loc.reshape(b, f, 3 * tp)
            loc = jnp.pad(loc, ((0, 0), (0, 0),
                                (0, max(t - 3 * tp, 0))))[:, :, :t]
            loc = jnp.swapaxes(loc, 1, 2)
            if cfg.fusion_type == "aff_1d":
                fused = AFF(64, name="fusion_model")(mel, loc)
            elif cfg.fusion_type == "iaff_1d":
                fused = iAFF(64, name="fusion_model")(mel, loc)
            else:
                fused = daf(mel, loc)
            mel = jnp.where(longer[:, None, None], fused, mel)

        block_cls = ConvBlock5x5 if cfg.model_name == "Cnn6" else ConvBlock
        plans = {"Cnn14": (64, 128, 256, 512, 1024, 2048),
                 "Cnn10": (64, 128, 256, 512, 1024),
                 "Cnn6": (64, 128, 256, 512)}
        plan = plans[cfg.model_name]

        if (cfg.enable_fusion and cfg.fusion_type == "channel_map"
                and mel_all is not None):
            x = jnp.moveaxis(mel_all, 1, -1)  # (B, T, F, 4) stem channels
        else:
            x = mel[..., None]  # (B, T, F, 1)

        x = block_cls(plan[0], name="conv_block1")(x, pool=2)
        if (cfg.enable_fusion and mel_all is not None
                and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d")):
            # local branch after block1 (pann_model.py:274-297): 5x5 conv
            # stride (6, 2) per local channel, concat along time
            b, nc, t, f = mel_all.shape
            loc = mel_all[:, 1:].reshape(b * 3, t, f, 1)
            loc = nn.Conv(64, (5, 5), strides=(6, 2),
                          padding=[(2, 2), (2, 2)], name="mel_conv2d")(loc)
            loc = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                               name="mel_conv2d_bn")(loc)
            loc = nn.relu(loc)
            th = x.shape[1]
            loc = loc.reshape(b, 3, loc.shape[1], loc.shape[2], 64)
            loc = loc.transpose(0, 1, 2, 3, 4).reshape(b, -1, loc.shape[3], 64)
            loc = (jnp.pad(loc, ((0, 0), (0, max(th - loc.shape[1], 0)),
                                 (0, 0), (0, 0)))[:, :th])
            if cfg.fusion_type == "aff_2d":
                fused = AFF(64, name="fusion_model")(x, loc)
            elif cfg.fusion_type == "iaff_2d":
                fused = iAFF(64, name="fusion_model")(x, loc)
            else:
                fused = daf(x, loc)
            x = jnp.where(longer[:, None, None, None], fused, x)

        for i, ch in enumerate(plan[1:], start=2):
            pool = 1 if (cfg.model_name == "Cnn14" and i == 6) else 2
            x = block_cls(ch, name=f"conv_block{i}")(x, pool=pool)

        x = jnp.mean(x, axis=2)  # mean over mel (torch dim=3) -> (B, T, C)
        fc1 = nn.Dense(cfg.emb_dim, name="fc1")
        latent = _pool1d_same(x, "max") + _pool1d_same(x, "avg")
        latent = nn.relu(fc1(latent))
        fine = jnp.repeat(latent, 32, axis=1)

        clip_feat = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
        emb = nn.relu(fc1(clip_feat))
        logits = nn.Dense(cfg.classes_num, name="fc_audioset")(emb)
        return {
            "embedding": emb,
            "clipwise_output": nn.sigmoid(logits),
            "fine_grained_embedding": fine,
        }
