"""Attentional feature fusion (DAF / AFF / iAFF) for variable-length audio.

Behavior parity: `ldm/modules/encoders/open_clap/feature_fusion.py` —
DAF (:11-20) is plain addition; AFF (:133-192) gates x vs residual with a
sigmoid of local (1x1 conv bottleneck) + global (global-avg-pool'd conv
bottleneck) attention; iAFF (:23-130) applies the gate twice. '1D' variants
operate on (B, L, C), '2D' on (B, H, W, C) — channels-last here.

Notes vs the reference:
  * The reference duplicates batch-size-1 inputs before the conv stack
    (feature_fusion.py:114-115) to dodge train-mode BatchNorm on a single
    sample; with inference-mode running stats that hack is a no-op, so it
    is not reproduced.
  * iAFF's second global branch reuses `global_att` (not `global_att2`) on
    the refined features — a reference quirk (feature_fusion.py:124) kept
    for weight-compatibility; `global_att2` still exists as parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def daf(x: jnp.ndarray, residual: jnp.ndarray) -> jnp.ndarray:
    """DirectAddFuse (feature_fusion.py:11-20)."""
    return x + residual


class _ConvBNBottleneck(nn.Module):
    """conv1x1 -> BN -> ReLU -> conv1x1 -> BN over (..., C), optionally on
    globally pooled features."""

    channels: int
    inter_channels: int
    global_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spatial_axes = tuple(range(1, x.ndim - 1))
        h = x
        if self.global_pool:
            h = jnp.mean(h, axis=spatial_axes, keepdims=True)
        kernel = (1,) * len(spatial_axes)
        h = nn.Conv(self.inter_channels, kernel, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, kernel, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        return h


class AFF(nn.Module):
    """feature_fusion.py:133-192. Output 2*x*w + 2*residual*(1-w)."""

    channels: int = 64
    r: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        inter = self.channels // self.r
        xa = x + residual
        xl = _ConvBNBottleneck(self.channels, inter, name="local_att")(xa, train)
        xg = _ConvBNBottleneck(self.channels, inter, global_pool=True,
                               name="global_att")(xa, train)
        wei = nn.sigmoid(xl + xg)
        return 2 * x * wei + 2 * residual * (1 - wei)


class iAFF(nn.Module):
    """feature_fusion.py:23-130 (two-stage gate)."""

    channels: int = 64
    r: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        inter = self.channels // self.r
        local_att = _ConvBNBottleneck(self.channels, inter, name="local_att")
        global_att = _ConvBNBottleneck(self.channels, inter, global_pool=True,
                                       name="global_att")
        local_att2 = _ConvBNBottleneck(self.channels, inter, name="local_att2")
        # no global_att2 submodule: the reference's forward never calls its
        # own global_att2 (feature_fusion.py:124 uses global_att twice), so
        # those dead weights are dropped by the converter

        xa = x + residual
        wei = nn.sigmoid(local_att(xa, train) + global_att(xa, train))
        xi = x * wei + residual * (1 - wei)
        wei2 = nn.sigmoid(local_att2(xi, train) + global_att(xi, train))
        return x * wei2 + residual * (1 - wei2)
