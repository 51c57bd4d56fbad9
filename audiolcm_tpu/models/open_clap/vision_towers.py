"""open_clap image towers: ModifiedResNet + VisualTransformer (flax).

Behavior parity: `ldm/modules/encoders/open_clap/model.py:47-373`
(`Bottleneck`, `AttentionPool2d`, `ModifiedResNet`, `ResidualAttentionBlock`,
`Transformer`, `VisualTransformer`, `QuickGELU`) — the image-CLIP tower
classes the vendored LAION tree still carries, plus their RN50/RN101/RN50x4/
RN50x16/ViT-B-32/ViT-B-16/ViT-L-14 JSON presets (`model_configs/*.json`).

Dead-code caveat, replicated for completeness not use: the reference `CLAP`
class never instantiates either tower (`model.py:420-549` builds only audio
and text branches; checkpoint loading explicitly pops `visual.*` keys,
`model.py:830-864`), so these are unreachable from `create_model`. They are
ported to close the parity row; the audio pipeline never touches them.

TPU-first notes: inference-mode towers (the reference only ever carried them
frozen), so BatchNorm uses running stats. The attention pool computes ONLY
the pooled query row — the reference runs full (HW+1)x(HW+1) attention and
keeps row 0 (`model.py:119-150`); attending the single mean+pos query to all
keys is mathematically identical and O(HW) instead of O(HW^2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """`QuickGELU` (`model.py:252-255`)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """nn.AvgPool2d(k) on NHWC."""
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """`model.py:47-103`: 1x1 -> 3x3 -> avgpool(stride) -> 1x1·4, all
    stride-1 convs (anti-aliased downsampling)."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inplanes = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                       name=name)
        out = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                        name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3), padding=1,
                                        use_bias=False, name="conv2")(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(nn.Conv(self.planes * self.expansion, (1, 1),
                                use_bias=False, name="conv3")(out))

        identity = x
        if self.stride > 1 or inplanes != self.planes * self.expansion:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False, name="downsample_conv")(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """`model.py:105-150`: mean token + positional embedding, one MHA,
    pooled output. Only the query row actually returned is computed."""

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim))
        tokens = tokens + pos[None]

        dh = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, name="v_proj")(tokens)
        split = lambda t: t.reshape(b, -1, self.num_heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * dh**-0.5
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """`model.py:153-244`: 3-conv stem + 4 Bottleneck stages + attn pool."""

    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    image_size: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image (B, H, W, 3) -> (B, output_dim)."""
        bn = lambda name: nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                       name=name)
        w = self.width
        x = nn.relu(bn("bn1")(nn.Conv(w // 2, (3, 3), strides=2, padding=1,
                                      use_bias=False, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(w // 2, (3, 3), padding=1,
                                      use_bias=False, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(w, (3, 3), padding=1,
                                      use_bias=False, name="conv3")(x)))
        x = _avg_pool(x, 2)

        for stage, (planes_mult, blocks) in enumerate(
                zip((1, 2, 4, 8), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                x = Bottleneck(w * planes_mult, stride if i == 0 else 1,
                               name=f"layer{stage + 1}_{i}")(x)

        return AttentionPool2d(
            embed_dim=w * 32, num_heads=self.heads, output_dim=self.output_dim,
            spacial_dim=self.image_size // 32, name="attnpool")(x)


class ResidualAttentionBlock(nn.Module):
    """`model.py:258-282`: pre-LN MHA + GELU MLP block."""

    d_model: int
    n_head: int
    act: Callable = jax.nn.gelu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        dh = self.d_model // self.n_head
        qkv = nn.Dense(3 * self.d_model, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, self.n_head, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * dh**-0.5
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.d_model)
        x = x + nn.Dense(self.d_model, name="out_proj")(out)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.d_model * 4, name="c_fc")(h)
        h = self.act(h)
        return x + nn.Dense(self.d_model, name="c_proj")(h)


class VisualTransformer(nn.Module):
    """`model.py:305-373`: patchify conv + cls token + transformer + proj."""

    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image (B, H, W, 3) -> (B, output_dim)."""
        b = x.shape[0]
        act = quick_gelu if self.quick_gelu else (
            lambda t: jax.nn.gelu(t, approximate=False))
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID", use_bias=False,
                    name="conv1")(x)
        x = x.reshape(b, -1, self.width)

        scale = self.width**-0.5
        cls = self.param("class_embedding", nn.initializers.normal(scale),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            ((self.image_size // self.patch_size) ** 2 + 1, self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, act,
                                       name=f"block_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (self.width, self.output_dim))
        return x @ proj


# --- image-CLIP vision presets (`model_configs/{RN*,ViT*}.json`) ---

@dataclass(frozen=True)
class VisionPreset:
    embed_dim: int
    layers: Union[Tuple[int, int, int, int], int]
    width: int
    image_size: int = 224
    patch_size: int = 16
    heads: int = 8  # RN: attnpool heads = width*32/64

VISION_PRESETS = {
    # name: (embed_dim, vision_cfg) from the reference JSONs
    "RN50": VisionPreset(1024, (3, 4, 6, 3), 64, heads=32),
    "RN50-quickgelu": VisionPreset(1024, (3, 4, 6, 3), 64, heads=32),
    "RN101": VisionPreset(512, (3, 4, 23, 3), 64, heads=32),
    "RN101-quickgelu": VisionPreset(512, (3, 4, 23, 3), 64, heads=32),
    "RN50x4": VisionPreset(640, (4, 6, 10, 6), 80, image_size=288, heads=40),
    "RN50x16": VisionPreset(768, (6, 8, 18, 8), 96, image_size=384, heads=48),
    "ViT-B-32": VisionPreset(512, 12, 768, patch_size=32, heads=12),
    "ViT-B-32-quickgelu": VisionPreset(512, 12, 768, patch_size=32, heads=12),
    "ViT-B-16": VisionPreset(512, 12, 768, patch_size=16, heads=12),
    "ViT-L-14": VisionPreset(768, 24, 1024, patch_size=14, heads=16),
}


def build_vision_tower(name: str) -> nn.Module:
    """Vision tower module for an image-CLIP preset name."""
    p = VISION_PRESETS[name]
    quick = name.endswith("-quickgelu")
    if isinstance(p.layers, tuple):
        return ModifiedResNet(layers=p.layers, output_dim=p.embed_dim,
                              heads=p.heads, image_size=p.image_size,
                              width=p.width)
    return VisualTransformer(
        image_size=p.image_size, patch_size=p.patch_size, width=p.width,
        layers=p.layers, heads=p.heads, output_dim=p.embed_dim,
        quick_gelu=quick)
