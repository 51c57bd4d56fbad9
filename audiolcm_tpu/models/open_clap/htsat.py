"""HTSAT — hierarchical token-semantic audio transformer (Swin) in Flax.

Behavior parity: `ldm/modules/encoders/open_clap/htsat.py` —
PatchEmbed (+2D feature-fusion branch, :71-144), WindowAttention with
relative position bias (:279-357), SwinTransformerBlock with cyclic shift
(:364-480), PatchMerging (:488-524), BasicLayer (:530-592), and
HTSAT_Swin_Transformer (:599-979): mel frontend (torchlibrosa-equivalent
48 kHz logmel), per-melbin BatchNorm, reshape_wav2img freq/time tiling,
4-stage Swin trunk, tscam conv head, avg-pooled `embedding` output.
Factory presets (tiny/base/large) from `create_htsat_model` (:981-1028).

TPU-first choices:
  * All resolutions/window masks are static: shift masks and relative
    position indices are precomputed with numpy at trace time; windows are
    jnp.roll + reshape (no data-dependent shapes).
  * The reference gathers "longer" samples for local fusion with boolean
    indexing (dynamic shapes); here local fusion is computed for the whole
    batch and blended with `jnp.where(longer, fused, global)` — identical
    results, one compiled graph.
  * Inference path (eval): SpecAugment / mixup / drop-path are train-time
    no-ops and omitted.
  * reshape_wav2img's bicubic resize uses an align_corners=True cubic
    kernel matching torch's `F.interpolate(..., mode="bicubic",
    align_corners=True)`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.clap_audio import ClapAudioConfig, logmel_torchlibrosa
from audiolcm_tpu.models.open_clap.fusion import AFF, daf, iAFF


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    num_classes: int = 527
    mlp_ratio: float = 4.0
    # audio frontend (model_configs/HTSAT-*.json audio_cfg)
    sample_rate: int = 48000
    mel_bins: int = 64
    window_size_stft: int = 1024
    hop_size: int = 480
    fmin: float = 50.0
    fmax: float = 14000.0
    enable_fusion: bool = False
    fusion_type: str = "None"

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


def htsat_preset(name: str, **overrides) -> HTSATConfig:
    """create_htsat_model presets (htsat.py:981-1028)."""
    presets = {
        "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2)),
        "base": dict(embed_dim=128, depths=(2, 2, 12, 2)),
        "large": dict(embed_dim=256, depths=(2, 2, 12, 2)),
    }
    if name not in presets:
        raise ValueError(f"model name for HTS-AT is wrong: {name}")
    return HTSATConfig(**{**presets[name], **overrides})


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C) (htsat.py:249-260)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Pairwise relative position lookup (htsat.py:305-316)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA mask, 0 / -100 (htsat.py:414-433). (nW, ws*ws, ws*ws)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray]) -> jnp.ndarray:
        ws, nh = self.window_size, self.num_heads
        b_, n, c = x.shape
        hd = c // nh
        qkv = nn.Dense(3 * c, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) * (2 * ws - 1), nh))
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(ws * ws, ws * ws, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + jnp.asarray(
                mask)[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0  # htsat.py:393-396
        b, l, c = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, ws, shift)
        else:
            mask = None
        windows = _window_partition(x, ws)
        attn = WindowAttention(self.dim, ws, self.num_heads,
                               name="attn")(windows, mask)
        x = _window_reverse(attn, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]], axis=-1).reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


def bicubic_align_corners_1d(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=True) along one
    axis (cubic convolution kernel a=-0.75)."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    pos = np.linspace(0.0, in_len - 1, out_len)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_len - 1)
    t = pos - i0
    a = -0.75

    def k(s):
        s = np.abs(s)
        return np.where(
            s <= 1, (a + 2) * s**3 - (a + 3) * s**2 + 1,
            np.where(s < 2, a * s**3 - 5 * a * s**2 + 8 * a * s - 4 * a, 0.0))

    idxs, wts = [], []
    for off in (-1, 0, 1, 2):
        idxs.append(np.clip(i0 + off, 0, in_len - 1))
        wts.append(k(t - off))
    out = 0.0
    for idx, wt in zip(idxs, wts):
        shape = [1] * x.ndim
        shape[axis] = out_len
        out = out + jnp.take(x, jnp.asarray(idx), axis=axis) * jnp.asarray(
            wt, x.dtype).reshape(shape)
    return out


class HTSAT(nn.Module):
    """Full HTSAT audio branch. Input either a waveform batch (B, samples)
    or, with enable_fusion, a mel_fusion stack (B, 4, T, mel) + longer mask
    (B,). Returns dict with 'embedding', 'clipwise_output',
    'fine_grained_embedding', 'framewise_output' like htsat.py:812-817."""

    config: HTSATConfig = HTSATConfig()

    def _reshape_wav2img(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F, 1) mel -> (B, spec, spec, 1) via freq-ratio tiling
        (htsat.py:833-848, channels-last)."""
        cfg = self.config
        b = x.shape[0]
        target_t = cfg.spec_size * cfg.freq_ratio
        target_f = cfg.spec_size // cfg.freq_ratio
        if x.shape[1] > target_t or x.shape[2] > target_f:
            raise ValueError("mel larger than the swin input lattice")
        if x.shape[1] < target_t:
            x = bicubic_align_corners_1d(x, target_t, axis=1)
        if x.shape[2] < target_f:
            x = bicubic_align_corners_1d(x, target_f, axis=2)
        # (B, T, F, 1) -> (B, F, T, 1) -> split T by freq_ratio and fold
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, x.shape[1], cfg.freq_ratio,
                      x.shape[2] // cfg.freq_ratio, 1)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(b, x.shape[1] * x.shape[2], x.shape[3], 1)

    def _patch_embed(self, x: jnp.ndarray, longer: Optional[jnp.ndarray],
                     local_mels: Optional[jnp.ndarray]) -> jnp.ndarray:
        """PatchEmbed with optional 2D fusion (htsat.py:71-144). x is the
        reshaped global mel image (B, S, S, 1)."""
        cfg = self.config
        ps, st = cfg.patch_size, cfg.patch_stride
        pad = (ps - st[0]) // 2
        grid = (cfg.spec_size // st[0], cfg.spec_size // st[1])
        h = nn.Conv(cfg.embed_dim, (ps, ps), strides=st,
                    padding=[(pad, pad), (pad, pad)], name="proj")(x)
        if (cfg.enable_fusion and local_mels is not None
                and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d")):
            # local branch: 3 extra mel channels, each (B, S, S, 1) image,
            # conv with 3x time stride then concat along time
            b, nc, th, tw = (local_mels.shape[0], local_mels.shape[1],
                             local_mels.shape[2], local_mels.shape[3])
            loc = local_mels.reshape(b * nc, th, tw, 1)
            loc = nn.Conv(cfg.embed_dim, (ps, ps * 3),
                          strides=(st[0], st[1] * 3),
                          padding=[(pad, pad), (pad, pad)],
                          name="mel_conv2d")(loc)
            loc = loc.reshape(b, nc, loc.shape[1], loc.shape[2], cfg.embed_dim)
            # (B, H', nc*W', C), pad/crop to the global patch width
            loc = loc.transpose(0, 2, 1, 3, 4).reshape(
                b, loc.shape[2], -1, cfg.embed_dim)
            gw = h.shape[2]
            if loc.shape[2] < gw:
                loc = jnp.pad(loc, ((0, 0), (0, 0), (0, gw - loc.shape[2]),
                                    (0, 0)))
            else:
                loc = loc[:, :, :gw]
            if cfg.fusion_type == "aff_2d":
                fused = AFF(cfg.embed_dim, name="fusion_model")(h, loc)
            elif cfg.fusion_type == "iaff_2d":
                fused = iAFF(cfg.embed_dim, name="fusion_model")(h, loc)
            else:
                fused = daf(h, loc)
            # blend instead of boolean-index (see module docstring)
            h = jnp.where(longer[:, None, None, None], fused, h)
        h = h.reshape(h.shape[0], grid[0] * grid[1], cfg.embed_dim)
        return nn.LayerNorm(epsilon=1e-5, name="patch_norm")(h)

    @nn.compact
    def __call__(self, waveform: Optional[jnp.ndarray] = None,
                 mel_fusion: Optional[jnp.ndarray] = None,
                 longer: Optional[jnp.ndarray] = None) -> dict:
        cfg = self.config
        acfg = ClapAudioConfig(
            sample_rate=cfg.sample_rate, window_size=cfg.window_size_stft,
            hop_size=cfg.hop_size, mel_bins=cfg.mel_bins, fmin=cfg.fmin,
            fmax=cfg.fmax)
        # bn0 over mel bins (htsat.py:686,885-887): BatchNorm with mel as
        # the (last) channel axis, shared across the 4 fusion channels
        bn0 = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn0")
        if mel_fusion is not None:
            mel_all = bn0(mel_fusion)  # (B, 4, T, mel), host-prepared
            mel = mel_all[:, 0]
        else:
            mel = bn0(logmel_torchlibrosa(waveform, acfg))  # (B, T, mel)
            mel_all = None

        local_mels = None
        if cfg.enable_fusion and mel_all is not None:
            if cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
                # 1D fusion on raw mels (htsat.py:903-923): conv1d each of
                # the 3 local channels along time (stride 3), concat along
                # time channel-major, pad/crop to T, gated fuse
                b, _, t, f = mel_all.shape
                loc = mel_all[:, 1:].reshape(b * 3, t, f)  # (B*3, T, F)
                loc = nn.Conv(64, (5,), strides=(3,), padding=[(2, 2)],
                              name="mel_conv1d")(loc)
                loc = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                   name="mel_conv1d_bn")(loc)
                tp = loc.shape[1]
                # (B,3,T',F) -> (B,F,3,T') -> (B,F,3*T'): channel-major time
                loc = loc.reshape(b, 3, tp, f).transpose(0, 3, 1, 2)
                loc = loc.reshape(b, f, 3 * tp)
                loc = jnp.pad(loc, ((0, 0), (0, 0),
                                    (0, max(t - 3 * tp, 0))))[:, :, :t]
                loc = jnp.swapaxes(loc, 1, 2)  # channels-last (B, T, F)
                if cfg.fusion_type == "aff_1d":
                    fused = AFF(64, name="fusion_model")(mel, loc)
                elif cfg.fusion_type == "iaff_1d":
                    fused = iAFF(64, name="fusion_model")(mel, loc)
                else:
                    fused = daf(mel, loc)
                mel = jnp.where(longer[:, None, None], fused, mel)
            else:
                # 2D fusion happens inside patch_embed on the spec image
                loc = mel_all[:, 1:]
                b, nc, t, f = loc.shape
                loc_img = self._reshape_wav2img(
                    loc.reshape(b * nc, t, f, 1)).reshape(
                        b, nc, cfg.spec_size, cfg.spec_size)
                local_mels = loc_img

        frames = self._reshape_wav2img(mel[..., None])  # (B, S, S, 1)
        x = self._patch_embed(frames, longer, local_mels)

        grid = (cfg.spec_size // cfg.patch_stride[0],
                cfg.spec_size // cfg.patch_stride[1])
        for i, depth in enumerate(cfg.depths):
            dim = int(cfg.embed_dim * 2**i)
            res = (grid[0] // 2**i, grid[1] // 2**i)
            for j in range(depth):
                x = SwinBlock(dim, res, cfg.num_heads[i], cfg.window_size,
                              0 if j % 2 == 0 else cfg.window_size // 2,
                              cfg.mlp_ratio, name=f"layer_{i}_block_{j}")(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(res, dim, name=f"downsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        # token-semantic head (htsat.py:786-817)
        b, n, c = x.shape
        down = 2 ** (len(cfg.depths) - 1)
        sf = cfg.spec_size // down // cfg.patch_stride[0]
        st_ = cfg.spec_size // down // cfg.patch_stride[1]
        img = x.transpose(0, 2, 1).reshape(b, c, sf, st_)
        cfb = sf // cfg.freq_ratio
        img = img.reshape(b, c, sf // cfb, cfb, st_)
        img = img.transpose(0, 1, 3, 2, 4).reshape(b, c, cfb, -1)

        fine = jnp.mean(img, axis=2)  # (B, C, T')
        ratio = 8 * cfg.patch_stride[1]
        fine_up = jnp.repeat(fine.transpose(0, 2, 1), ratio, axis=1)

        embedding = jnp.mean(img.reshape(b, c, -1), axis=-1)

        # tscam conv: kernel (cfb, 3), channels-last (B, cfb, T', C)
        timg = img.transpose(0, 2, 3, 1)
        logits_map = nn.Conv(cfg.num_classes, (cfb, 3), padding=[(0, 0), (1, 1)],
                             name="tscam_conv")(timg)  # (B, 1, T', classes)
        logits = logits_map[:, 0]  # (B, T', classes)
        framewise = jnp.repeat(nn.sigmoid(logits), ratio, axis=1)
        clipwise = nn.sigmoid(jnp.mean(logits, axis=1))
        return {
            "embedding": embedding,
            "clipwise_output": clipwise,
            "fine_grained_embedding": fine_up,
            "framewise_output": framewise,
        }
