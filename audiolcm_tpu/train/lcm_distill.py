"""LCM consistency-distillation training step — the core training path.

Behavior parity: `ldm/models/diffusion/lcm_audio.py:456-476,618-698,996-1024`
and configs/audiolcm.yaml:
  * three networks: frozen teacher, trainable student, EMA target (rate 0.95
    updated every step)
  * t sampled from the 50-step DDIM grid; guidance w ~ U[w_min=4, w_max=12]
    with a 256-d Fourier embedding fed to the student/target only
  * teacher CFG extrapolation in BOTH x0 and eps space, one DDIM solver step
    to x_prev, target-net consistency prediction at t-k
  * pseudo-Huber loss sqrt(d^2 + c^2) - c with c = 1e-3
  * AdamW on the student only; LambdaLinear warm-up schedule

TPU-first design: the entire distillation step (3 DiT forwards + 1 backward
+ optimizer + EMA) is ONE jitted function; under a data mesh the batch dim
is sharded and XLA inserts the gradient psum over ICI. The uncond context is
precomputed once and passed in (the reference re-encodes "" every step,
`lcm_audio.py:647` — a pure win to cache).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from audiolcm_tpu.diffusion.lcm import DDIMSolver, boundary_scalings
from audiolcm_tpu.diffusion.schedule import NoiseSchedule, _append_dims
from audiolcm_tpu.nn.embeddings import guidance_scale_embedding


@dataclasses.dataclass(frozen=True)
class LCMDistillConfig:
    num_ddim_timesteps: int = 50
    w_min: float = 4.0
    w_max: float = 12.0
    huber_c: float = 1.0e-3
    ema_decay: float = 0.95  # target <- 0.95*target + 0.05*student
    learning_rate: float = 3.0e-6  # base_lr; caller applies ngpu*bs scaling
    warmup_steps: int = 10000
    weight_decay: float = 1.0e-2  # torch.optim.AdamW default
    grad_clip: float = 1.0  # lightning.trainer.gradient_clip_val
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1.0e-8
    # optional optax.Schedule (already including base_lr; see
    # train/lr_schedules.build_schedule). None = the shipped lambda-linear.
    lr_schedule: Optional[Callable] = None


class TrainState(NamedTuple):
    step: jnp.ndarray
    student: Any
    target: Any
    opt_state: Any


class Batch(NamedTuple):
    """One sharded training batch (latents already VAE-encoded + scaled)."""

    z: jnp.ndarray  # (B, T, C) scaled latents
    context: jnp.ndarray  # (B, 154, ctx_dim)


def lambda_linear_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """`ldm/lr_scheduler.py:81-97` with the shipped f_start=1e-6, f_max=f_min=1:
    linear ramp from ~0 to base_lr over warm-up, then constant."""

    def fn(step):
        frac = jnp.minimum(step.astype(jnp.float32) / warmup_steps, 1.0)
        f = 1.0e-6 + (1.0 - 1.0e-6) * frac
        return base_lr * f

    return fn


def make_optimizer(cfg: LCMDistillConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=cfg.lr_schedule
            or lambda_linear_schedule(cfg.learning_rate, cfg.warmup_steps),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )


def make_lcm_distill_step(
    dit_apply: Callable[..., jnp.ndarray],
    schedule: NoiseSchedule,
    cfg: LCMDistillConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> Callable:
    """Returns step(state, teacher_params, batch, uncond_context, rng) ->
    (state, metrics). dit_apply(params, x, t, context, w_cond) -> eps.
    """
    optimizer = optimizer if optimizer is not None else make_optimizer(cfg)
    solver = DDIMSolver(
        jax.device_get(schedule.alphas_cumprod),
        schedule.num_timesteps,
        cfg.num_ddim_timesteps,
    )
    ddim_timesteps = jnp.asarray(solver.ddim_timesteps, dtype=jnp.int32)
    step_ratio = schedule.num_timesteps // cfg.num_ddim_timesteps

    def loss_fn(student_params, target_params, teacher_params, batch, uncond_ctx, rng):
        z, context = batch.z, batch.context
        bsz = z.shape[0]
        r_index, r_noise, r_w = jax.random.split(rng, 3)

        index = jax.random.randint(r_index, (bsz,), 0, cfg.num_ddim_timesteps)
        t = ddim_timesteps[index]
        t_prev = jnp.maximum(t - step_ratio, 0)

        c_skip_s, c_out_s = boundary_scalings(t)
        c_skip_s = _append_dims(c_skip_s, z.ndim)
        c_out_s = _append_dims(c_out_s, z.ndim)
        c_skip, c_out = boundary_scalings(t_prev)
        c_skip = _append_dims(c_skip, z.ndim)
        c_out = _append_dims(c_out, z.ndim)

        noise = jax.random.normal(r_noise, z.shape)
        x_noisy = schedule.q_sample(z, t, noise)

        w = jax.random.uniform(r_w, (bsz,), minval=cfg.w_min, maxval=cfg.w_max)
        w_emb = guidance_scale_embedding(w, 256)
        w_b = _append_dims(w, z.ndim)

        # student consistency prediction at t
        eps_student = dit_apply(student_params, x_noisy, t, context, w_emb)
        x0_student = schedule.predict_start_from_noise(x_noisy, t, eps_student)
        model_pred = c_skip_s * x_noisy + c_out_s * x0_student

        # teacher CFG + one DDIM step (no grads flow: params are a const arg)
        eps_teacher = dit_apply(teacher_params, x_noisy, t, context, None)
        x0_teacher = schedule.predict_start_from_noise(x_noisy, t, eps_teacher)
        uc = jnp.broadcast_to(uncond_ctx, context.shape)
        eps_teacher_u = dit_apply(teacher_params, x_noisy, t, uc, None)
        x0_teacher_u = schedule.predict_start_from_noise(x_noisy, t, eps_teacher_u)
        pred_x0 = x0_teacher + w_b * (x0_teacher - x0_teacher_u)
        pred_noise = eps_teacher + w_b * (eps_teacher - eps_teacher_u)
        x_prev = solver.ddim_step(pred_x0, pred_noise, index)
        x_prev = jax.lax.stop_gradient(x_prev)

        # target-net consistency prediction at t - k
        eps_target = dit_apply(target_params, x_prev, t_prev, context, w_emb)
        x0_target = schedule.predict_start_from_noise(x_prev, t_prev, eps_target)
        target = jax.lax.stop_gradient(c_skip * x_prev + c_out * x0_target)

        c = cfg.huber_c
        diff = model_pred.astype(jnp.float32) - target.astype(jnp.float32)
        loss = jnp.mean(jnp.sqrt(diff**2 + c**2) - c)
        return loss

    def step(
        state: TrainState,
        teacher_params,
        batch: Batch,
        uncond_ctx: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[TrainState, dict]:
        loss, grads = jax.value_and_grad(loss_fn)(
            state.student, state.target, teacher_params, batch, uncond_ctx, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        # manual EMA of the target net at rate 0.95 (`lcm_audio.py:1021-1024`)
        target = jax.tree.map(
            lambda tgt, s: cfg.ema_decay * tgt + (1.0 - cfg.ema_decay) * s,
            state.target,
            student,
        )
        new_state = TrainState(state.step + 1, student, target, opt_state)
        metrics = {
            "train/loss": loss,
            "train/grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return step


def init_train_state(
    student_params, cfg: LCMDistillConfig, optimizer=None
) -> TrainState:
    """Student initialized from teacher weights; target copies student
    (`lcm_audio.py:107-114`)."""
    optimizer = optimizer if optimizer is not None else make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        student=student_params,
        target=jax.tree.map(jnp.copy, student_params),
        opt_state=optimizer.init(student_params),
    )
