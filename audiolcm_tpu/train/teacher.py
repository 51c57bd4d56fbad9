"""Teacher LDM training step (eps-prediction MSE).

Behavior parity: `ldm/models/diffusion/ddpm_audio.py:419-508` /
`ddpm.py:273-341` with configs/teacher.yaml: t ~ U[0, 1000), q_sample,
eps-MSE per-sample mean, divided by exp(logvar_t) (+logvar_t) with
logvar_init=0 (non-learned -> identity), plus original_elbo_weight (0 by
default) * lvlb-weighted term. AdamW over the DiT (+ cond-stage projections
when cond_stage_trainable, `teacher.yaml:15`), LambdaLinear warm-up,
gradient clip 1.0.

One jitted step on the data mesh; the text towers run inside the step when
trainable (so their projection grads flow), and outside (cached contexts)
when frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.train.lcm_distill import lambda_linear_schedule


@dataclasses.dataclass(frozen=True)
class TeacherConfig:
    learning_rate: float = 1.0e-5  # teacher.yaml base_learning_rate
    warmup_steps: int = 10000
    grad_clip: float = 1.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    weight_decay: float = 1.0e-2
    # optional optax.Schedule (already including base_lr; see
    # train/lr_schedules.build_schedule). None = the shipped lambda-linear.
    lr_schedule: Optional[Callable] = None


class TeacherState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_teacher_optimizer(cfg: TeacherConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=cfg.lr_schedule
            or lambda_linear_schedule(cfg.learning_rate, cfg.warmup_steps),
            weight_decay=cfg.weight_decay,
        ),
    )


def make_teacher_step(
    dit_apply: Callable,  # (params, x, t, context, w_cond=None) -> eps
    schedule: NoiseSchedule,
    cfg: TeacherConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Callable:
    optimizer = optimizer if optimizer is not None else make_teacher_optimizer(cfg)
    # lvlb weights for the (usually zero-weight) ELBO term (`ddpm.py:160-167`)
    betas = schedule.betas
    acp = schedule.alphas_cumprod
    alphas = 1.0 - betas
    lvlb = betas**2 / (2 * schedule.posterior_variance * alphas * (1 - acp))
    lvlb = lvlb.at[0].set(lvlb[1])

    def loss_fn(params, z, context, rng):
        bsz = z.shape[0]
        r_t, r_noise = jax.random.split(rng)
        t = jax.random.randint(r_t, (bsz,), 0, schedule.num_timesteps)
        noise = jax.random.normal(r_noise, z.shape)
        x_noisy = schedule.q_sample(z, t, noise)
        eps_pred = dit_apply(params, x_noisy, t, context, None)
        per_sample = jnp.mean((eps_pred - noise) ** 2, axis=tuple(range(1, z.ndim)))
        loss_simple = jnp.mean(per_sample)
        loss = cfg.l_simple_weight * loss_simple
        if cfg.original_elbo_weight > 0:
            loss_vlb = jnp.mean(lvlb[t] * per_sample)
            loss = loss + cfg.original_elbo_weight * loss_vlb
        return loss, {"train/loss_simple": loss_simple}

    def step(
        state: TeacherState, z: jnp.ndarray, context: jnp.ndarray, rng: jax.Array
    ) -> Tuple[TeacherState, dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, z, context, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["train/loss"] = loss
        metrics["train/grad_norm"] = optax.global_norm(grads)
        return TeacherState(state.step + 1, params, opt_state), metrics

    return step


def init_teacher_state(params, cfg: TeacherConfig, optimizer=None) -> TeacherState:
    optimizer = optimizer if optimizer is not None else make_teacher_optimizer(cfg)
    return TeacherState(jnp.zeros((), jnp.int32), params, optimizer.init(params))
