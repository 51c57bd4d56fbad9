"""LPAPS — learned perceptual metric over mel spectrograms.

Behavior parity: `ldm/modules/losses_audio/lpaps.py` (adapted LPIPS from
SpecVQGAN). The backbone is VGGishish16 — a VGG16-style conv stack trained
on VGGSound mels — tapped at the five ReLU stages (lpaps.py:88-125, conv
plan [64,64,MP,128,128,MP,256,256,256,MP,512,512,512,MP,512,512,512]
lpaps.py:130), with: a per-frequency ScalingLayer (stats buffers,
lpaps.py:62-77), unit-normalization along channels (:138-140), squared
feature differences, 1x1 NetLin heads (:80-86) and spatial averaging
(:142-143).

The reference's own file is unloadable as-is (its `VGGishish` import is
commented out, :13) and the weights are external downloads; here the model
is defined from the documented plan and weights load through
`lpaps_params_from_torch` when the checkpoint exists. Channels-last
(B, F, T, 1) mels.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

VGG_PLAN = (64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP",
            512, 512, 512, "MP", 512, 512, 512)
LPAPS_CHANNELS = (64, 128, 256, 512, 512)


class VGGishish16(nn.Module):
    """VGG16 conv trunk (no BN), returns the 5 stage activations
    (lpaps.py:112-125): after convs 2, 4, 7, 10, 13."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        taps = []
        conv_i = 0
        stage_end = {2, 4, 7, 10, 13}
        for item in VGG_PLAN:
            if item == "MP":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"conv_{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
            if conv_i in stage_end:
                taps.append(x)
        return taps


class LPAPS(nn.Module):
    """Frozen perceptual distance. Input mels (B, F, T, 1) in [-1, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # ScalingLayer: per-frequency shift/scale (lpaps.py:62-77)
        shift = self.param("shift", nn.initializers.zeros, (x.shape[1], 1, 1))
        scale = self.param("scale", nn.initializers.ones, (x.shape[1], 1, 1))
        net = VGGishish16(name="net")
        outs0 = net((x - shift) / scale)
        outs1 = net((y - shift) / scale)
        val = jnp.zeros((x.shape[0], 1, 1, 1), x.dtype)
        for k, (f0, f1) in enumerate(zip(outs0, outs1)):
            n0 = f0 / (jnp.sqrt(jnp.sum(f0**2, axis=-1, keepdims=True)) + 1e-10)
            n1 = f1 / (jnp.sqrt(jnp.sum(f1**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (n0 - n1) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{k}")
            val = val + jnp.mean(head(diff), axis=(1, 2), keepdims=True)
        return val


def lpaps_params_from_torch(state_dict, mean_std: np.ndarray | None = None):
    """torch LPAPS state_dict -> flax params tree.

    Keys: `net.sliceN.<idx>.weight/bias` conv stack (flattened back to the
    global conv order) and `linK.model.1.weight` heads; ScalingLayer stats
    come from the `vggishish_mean_std_melspec_10s_22050hz` text file
    ([0,1]-domain means/stds remapped to [-1,1], lpaps.py:69-71).
    """

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    convs = {}
    # slice boundaries in torch feature indices (lpaps.py:98-107)
    order = []
    feat_idx = 0
    conv_i = 0
    for item in VGG_PLAN:
        if item == "MP":
            feat_idx += 1
            continue
        order.append((feat_idx, conv_i))
        feat_idx += 2  # conv + relu
        conv_i += 1
    slice_of = lambda fi: (1 if fi < 4 else 2 if fi < 9 else 3 if fi < 16
                           else 4 if fi < 23 else 5)
    for fi, ci in order:
        w = state_dict[f"net.slice{slice_of(fi)}.{fi}.weight"]
        b = state_dict[f"net.slice{slice_of(fi)}.{fi}.bias"]
        convs[f"conv_{ci}"] = {
            "kernel": to_np(w).transpose(2, 3, 1, 0),
            "bias": to_np(b),
        }
    params = {"net": convs}
    for k in range(5):
        w = to_np(state_dict[f"lin{k}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin_{k}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    if mean_std is not None:
        means, stds = np.asarray(mean_std, np.float32).T
        params["shift"] = (2 * means - 1)[:, None, None]
        params["scale"] = (2 * stds)[:, None, None]
    else:
        # torch buffers are (1, 1, F, 1); flatten to per-frequency vectors
        if "scaling_layer.shift" in state_dict:
            params["shift"] = to_np(
                state_dict["scaling_layer.shift"]).reshape(-1, 1, 1)
            params["scale"] = to_np(
                state_dict["scaling_layer.scale"]).reshape(-1, 1, 1)
        else:
            params["shift"] = np.zeros((80, 1, 1), np.float32)
            params["scale"] = np.ones((80, 1, 1), np.float32)
    return {"params": params}
