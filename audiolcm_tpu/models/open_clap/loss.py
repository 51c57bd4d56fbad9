"""open_clap contrastive losses, TPU-native.

Behavior parity: `ldm/modules/encoders/open_clap/loss.py` —
`gather_features` (:15-93) and `ClipLoss` (:96-224): symmetric InfoNCE over
audio/text features; the `mlp_loss` variant crosses raw features against
the MLP-transformed features of the other modality with separate
logit scales (loss.py:130-176); optional per-class weighting by
exp(sum similarity / (kappa*N)) (:159-176,209-222).

TPU-native distribution: the reference's torch.distributed all_gather maps
to `jax.lax.all_gather` over the data-parallel mesh axis when the loss runs
inside shard_map/pjit with a named axis; pass `axis_name` to enable it —
gradients flow through all_gather exactly like the reference's
`gather_with_grad=True` path (the no-grad variant is a DDP artifact with no
XLA analog worth reproducing). `local_loss=True` computes each shard's
local-vs-global logits, identical semantics to the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _xent(logits: jnp.ndarray, labels: jnp.ndarray,
          weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch F.cross_entropy (mean reduction, optional per-class weight)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def gather_features(features: jnp.ndarray,
                    axis_name: Optional[str] = None) -> jnp.ndarray:
    """loss.py:15-93 without the DDP grad bookkeeping: with an axis name,
    all_gather along the mesh data axis (grads flow through)."""
    if axis_name is None:
        return features
    return jax.lax.all_gather(features, axis_name, tiled=True)


@dataclasses.dataclass(frozen=True)
class ClipLossConfig:
    mlp_loss: bool = False
    local_loss: bool = False
    weight_loss_kappa: float = 0.0
    axis_name: Optional[str] = None  # data mesh axis when sharded


def clip_loss(audio_features: jnp.ndarray, text_features: jnp.ndarray,
              logit_scale_a: jnp.ndarray,
              logit_scale_t: Optional[jnp.ndarray] = None,
              audio_features_mlp: Optional[jnp.ndarray] = None,
              text_features_mlp: Optional[jnp.ndarray] = None,
              cfg: ClipLossConfig = ClipLossConfig()) -> jnp.ndarray:
    """ClipLoss.forward (loss.py:121-224)."""
    ax = cfg.axis_name
    weighted = cfg.weight_loss_kappa != 0
    rank = jax.lax.axis_index(ax) if ax is not None else 0

    def labels_for(n):
        base = jnp.arange(n)
        if ax is not None and cfg.local_loss:
            return base + n * rank
        return base

    if cfg.mlp_loss:
        a_all = gather_features(audio_features, ax)
        t_all = gather_features(text_features, ax)
        am_all = gather_features(audio_features_mlp, ax)
        tm_all = gather_features(text_features_mlp, ax)
        if ax is not None and cfg.local_loss:
            la_a = logit_scale_a * audio_features @ tm_all.T
            la_t = logit_scale_a * text_features_mlp @ a_all.T
            lt_a = logit_scale_t * audio_features_mlp @ t_all.T
            lt_t = logit_scale_t * text_features @ am_all.T
        else:
            la_a = logit_scale_a * a_all @ tm_all.T
            la_t = la_a.T
            lt_a = logit_scale_t * am_all @ t_all.T
            lt_t = lt_a.T
        labels = labels_for(la_a.shape[0])
        if not weighted:
            return (_xent(la_a, labels) + _xent(la_t, labels)
                    + _xent(lt_a, labels) + _xent(lt_t, labels)) / 4
        aw = jax.lax.stop_gradient(jnp.exp(
            jnp.sum(audio_features @ audio_features.T, axis=1)
            / (cfg.weight_loss_kappa * audio_features.shape[0])))
        tw = jax.lax.stop_gradient(jnp.exp(
            jnp.sum(text_features @ text_features.T, axis=1)
            / (cfg.weight_loss_kappa * text_features.shape[0])))
        return (_xent(la_a, labels, aw) + _xent(la_t, labels, aw)
                + _xent(lt_a, labels, tw) + _xent(lt_t, labels, tw)) / 4

    a_all = gather_features(audio_features, ax)
    t_all = gather_features(text_features, ax)
    if ax is not None and cfg.local_loss:
        logits_a = logit_scale_a * audio_features @ t_all.T
        logits_t = logit_scale_a * text_features @ a_all.T
    else:
        logits_a = logit_scale_a * a_all @ t_all.T
        logits_t = logits_a.T
    labels = labels_for(logits_a.shape[0])
    if not weighted:
        return (_xent(logits_a, labels) + _xent(logits_t, labels)) / 2
    aw = jax.lax.stop_gradient(jnp.exp(
        jnp.sum(a_all @ a_all.T, axis=1)
        / (cfg.weight_loss_kappa * a_all.shape[0])))
    tw = jax.lax.stop_gradient(jnp.exp(
        jnp.sum(t_all @ t_all.T, axis=1)
        / (cfg.weight_loss_kappa * t_all.shape[0])))
    return (_xent(logits_a, labels, tw) + _xent(logits_t, labels, aw)) / 2
