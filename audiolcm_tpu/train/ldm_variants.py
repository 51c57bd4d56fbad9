"""Training steps for the reference's auxiliary latent-diffusion variants.

Behavior parity:
  * Inpainting LDM — `ldm/models/diffusion/ddpm_audio_inpaint.py`
    (`LatentDiffusion_audioinpaint`): hybrid conditioning where the denoiser
    input is `concat([x_noisy, masked_latent, resized_mask])` along channels
    and the text embedding rides cross-attention
    (get_input :283-298, DiffusionWrapper 'hybrid' routing `ddpm.py:1404-1423`);
    eps-MSE p_losses (:700-) identical to the teacher's.
  * Temporal-order LDM — `ddpm_audio_order.py` (`LatentDiffusion_audio`):
    same eps-MSE objective (:451-) with the order-token conditioning dict
    produced by FrozenCLAPOrderEmbedder2/3 feeding a ConcatOrderDiT.
  * Noisy-latent classifier — `classifier.py`
    (`NoisyLatentImageClassifier`): frozen diffusion q_sample at random t,
    classifier logits on x_noisy, cross-entropy + top-k accuracy
    (:179-197,150-155), AdamW weight_decay 1e-2 (:220-223), and the
    per-noise-level validation accuracy sweep (:202-218).

All steps are pure jitted functions over the data mesh, sharing
TeacherConfig's optimizer (AdamW + LambdaLinear warm-up + clip 1.0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.train.teacher import (
    TeacherConfig,
    TeacherState,
    make_teacher_optimizer,
)


def resize_mask_nearest(mask: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') of a (B, 1, T) / (B, T) mask to
    the latent length (ddpm_audio_inpaint.py:296-297)."""
    if mask.ndim == 2:
        mask = mask[:, None, :]
    src = mask.shape[-1]
    idx = (jnp.arange(target_len) * src) // target_len
    return jnp.take(mask, idx, axis=-1)


def build_inpaint_cond(masked_latent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """c_concat = cat([masked-image latent, mask resized to latent T])
    along channels (ddpm_audio_inpaint.py:295-298). Channels-first latents
    (B, C, T')."""
    resized = resize_mask_nearest(mask, masked_latent.shape[-1])
    return jnp.concatenate([masked_latent, resized.astype(masked_latent.dtype)],
                           axis=1)


def make_inpaint_step(
    dit_apply: Callable,  # (params, x_cat, t, context) -> eps over z-channels
    schedule: NoiseSchedule,
    cfg: TeacherConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Callable:
    """Hybrid-conditioned eps-MSE step. The denoiser must be built with
    in_channels = z_channels + c_concat channels; it predicts eps for the
    z channels only."""
    optimizer = optimizer if optimizer is not None else make_teacher_optimizer(cfg)

    def loss_fn(params, z, c_concat, context, rng):
        bsz = z.shape[0]
        r_t, r_noise = jax.random.split(rng)
        t = jax.random.randint(r_t, (bsz,), 0, schedule.num_timesteps)
        noise = jax.random.normal(r_noise, z.shape)
        x_noisy = schedule.q_sample(z, t, noise)
        x_cat = jnp.concatenate([x_noisy, c_concat], axis=1)
        eps_pred = dit_apply(params, x_cat, t, context)
        per_sample = jnp.mean((eps_pred - noise) ** 2,
                              axis=tuple(range(1, z.ndim)))
        loss = cfg.l_simple_weight * jnp.mean(per_sample)
        return loss, {"train/loss_simple": jnp.mean(per_sample),
                      "train/loss": loss}

    def step(state: TeacherState, z, c_concat, context, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, z, c_concat, context, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TeacherState(state.step + 1, params, opt_state), metrics

    return step


def make_order_step(
    order_dit_apply: Callable,  # (params, x, t, token_emb, order_index) -> eps
    schedule: NoiseSchedule,
    cfg: TeacherConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Callable:
    """Order-conditioned teacher step (ddpm_audio_order.py:451-): the cond
    is (token_embedding, order_index) from data/struct_captions +
    models/order_dit."""
    optimizer = optimizer if optimizer is not None else make_teacher_optimizer(cfg)

    def loss_fn(params, z, token_emb, order_index, rng):
        bsz = z.shape[0]
        r_t, r_noise = jax.random.split(rng)
        t = jax.random.randint(r_t, (bsz,), 0, schedule.num_timesteps)
        noise = jax.random.normal(r_noise, z.shape)
        x_noisy = schedule.q_sample(z, t, noise)
        eps_pred = order_dit_apply(params, x_noisy, t, token_emb, order_index)
        per_sample = jnp.mean((eps_pred - noise) ** 2,
                              axis=tuple(range(1, z.ndim)))
        loss = cfg.l_simple_weight * jnp.mean(per_sample)
        return loss, {"train/loss_simple": jnp.mean(per_sample),
                      "train/loss": loss}

    def step(state: TeacherState, z, token_emb, order_index, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, z, token_emb, order_index, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TeacherState(state.step + 1, params, opt_state), metrics

    return step


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    num_classes: int = 527
    learning_rate: float = 1.0e-4
    weight_decay: float = 1.0e-2  # classifier.py:221
    log_steps: int = 10


class ClassifierState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int) -> jnp.ndarray:
    """classifier.py:150-155."""
    _, top = jax.lax.top_k(logits, k)
    return jnp.mean(jnp.sum((top == labels[:, None]).astype(jnp.float32),
                            axis=-1))


def make_classifier_optimizer(cfg: ClassifierConfig):
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


def make_classifier_step(
    classifier_apply: Callable,  # (params, x_noisy, t) -> logits (B, classes)
    schedule: NoiseSchedule,
    cfg: ClassifierConfig,
) -> Callable:
    """classifier.py:179-200: latents are frozen-diffusion inputs; only the
    classifier head trains."""
    optimizer = make_classifier_optimizer(cfg)

    def loss_fn(params, z, targets, rng, t_fixed):
        bsz = z.shape[0]
        r_t, r_noise = jax.random.split(rng)
        t = jnp.where(
            t_fixed >= 0,
            jnp.full((bsz,), t_fixed, jnp.int32),
            jax.random.randint(r_t, (bsz,), 0, schedule.num_timesteps))
        noise = jax.random.normal(r_noise, z.shape)
        x_noisy = schedule.q_sample(z, t, noise)
        logits = classifier_apply(params, x_noisy, t)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        loss = jnp.mean(nll)
        metrics = {
            "train/loss": loss,
            "train/acc@1": top_k_accuracy(logits, targets, 1),
            "train/acc@5": top_k_accuracy(logits, targets, 5),
        }
        return loss, metrics

    def step(state: ClassifierState, z, targets, rng, t_fixed=-1):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, z, targets, rng, t_fixed)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return ClassifierState(state.step + 1, params, opt_state), metrics

    return step


def init_classifier_state(params, cfg: ClassifierConfig) -> ClassifierState:
    return ClassifierState(jnp.zeros((), jnp.int32), params,
                           make_classifier_optimizer(cfg).init(params))


def noisy_accuracy_sweep(
    classifier_apply: Callable,
    params,
    z: jnp.ndarray,
    targets: jnp.ndarray,
    schedule: NoiseSchedule,
    rng: jax.Array,
    log_every_t: int = 100,
) -> dict:
    """Per-noise-level validation accuracies (classifier.py:202-218):
    acc@1/acc@5 at each t in range(0, T, log_every_t)."""
    out = {}
    for t_val in range(0, schedule.num_timesteps, log_every_t):
        rng, r = jax.random.split(rng)
        noise = jax.random.normal(r, z.shape)
        t = jnp.full((z.shape[0],), t_val, jnp.int32)
        logits = classifier_apply(params, schedule.q_sample(z, t, noise), t)
        out[t_val] = {
            "acc@1": float(top_k_accuracy(logits, targets, 1)),
            "acc@5": float(top_k_accuracy(logits, targets, 5)),
        }
    return out
