"""Latent Consistency Model sampling + distillation solver math.

Behavior parity:
  * timestep grid & boundary scalings — `scheduling_lcm.py:153-254,402-408`
  * the S-step sampling loop — `scheduling_lcm.py:344-382,410-495`
  * DDIM solver used during distillation — `ddim_solver.py:11-35`

TPU-first design: the sampling loop is a `jax.lax.scan` over a precomputed
static timestep table, so the whole prompt->latent denoising compiles into
one XLA program (no per-step Python dispatch). All schedule lookups become
static gathers of tiny (S,) arrays baked into the graph.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.diffusion.schedule import NoiseSchedule, _append_dims
from audiolcm_tpu.nn.embeddings import guidance_scale_embedding


@dataclasses.dataclass(frozen=True)
class LCMConfig:
    num_inference_steps: int = 2
    original_inference_steps: int = 50
    guidance_scale: float = 5.0
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5


def lcm_inference_timesteps(
    num_inference_steps: int,
    original_inference_steps: int = 50,
    num_train_timesteps: int = 1000,
    strength: float = 1.0,
) -> np.ndarray:
    """The S descending timesteps used at inference (`scheduling_lcm.py:166-254`).

    k = N // original_steps; origin grid (1..original_steps)*k - 1 reversed;
    pick S approximately-evenly-spaced entries via floor(linspace).
    Defaults give [999, 499] for S=2.
    """
    k = num_train_timesteps // original_inference_steps
    origin = np.arange(1, int(original_inference_steps * strength) + 1, dtype=np.int64) * k - 1
    origin = origin[::-1].copy()
    idx = np.floor(
        np.linspace(0, len(origin), num=num_inference_steps, endpoint=False)
    ).astype(np.int64)
    return origin[idx]


def boundary_scalings(
    timestep: jnp.ndarray,
    timestep_scaling: float = 10.0,
    sigma_data: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Consistency boundary coefficients c_skip, c_out.

    `scheduling_lcm.py:402-408` / `lcm_audio.py:38-41` (the training code
    writes `t / 0.1`, identical to `t * 10`).
    """
    ts = timestep.astype(jnp.float32) * timestep_scaling
    c_skip = sigma_data**2 / (ts**2 + sigma_data**2)
    c_out = ts / jnp.sqrt(ts**2 + sigma_data**2)
    return c_skip, c_out


def lcm_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: NoiseSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    config: LCMConfig = LCMConfig(),
    x_T: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the S-step LCM loop inside one scan; returns `denoised`.

    denoise_fn(x_t, t, w_embedding) -> eps prediction; x shape (B, T, C).
    Mirrors `scheduling_lcm.py:344-382`: start from N(0, I), at each step
    predict eps, convert to x0-hat, blend with boundary scalings, and
    re-noise to the next grid point except on the last step.
    """
    batch = shape[0]
    steps = lcm_inference_timesteps(
        config.num_inference_steps,
        config.original_inference_steps,
        schedule.num_timesteps,
    )
    # Static per-step tables (baked into the compiled graph).
    alpha_prod = np.asarray(schedule.alphas_cumprod)[steps]
    alpha_prod_prev = np.append(alpha_prod[1:], alpha_prod[-1])  # prev = next entry
    is_last = np.zeros(len(steps), dtype=np.float32)
    is_last[-1] = 1.0

    ts_table = jnp.asarray(steps, dtype=jnp.int32)
    ap_table = jnp.asarray(alpha_prod, dtype=jnp.float32)
    app_table = jnp.asarray(alpha_prod_prev, dtype=jnp.float32)
    last_table = jnp.asarray(is_last)

    w = jnp.full((batch,), config.guidance_scale - 1.0, dtype=jnp.float32)
    w_emb = guidance_scale_embedding(w, 256).astype(dtype)

    rng, init_rng = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_rng, shape, dtype=jnp.float32)
    step_rngs = jax.random.split(rng, len(steps))

    def body(carry, inp):
        img, denoised = carry
        t, a_t, a_prev, last, step_rng = inp
        ts = jnp.full((batch,), t, dtype=jnp.int32)
        eps = denoise_fn(img.astype(dtype), ts, w_emb).astype(jnp.float32)
        x0 = (img - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        c_skip, c_out = boundary_scalings(
            t.astype(jnp.float32), config.timestep_scaling, config.sigma_data
        )
        denoised = c_out * x0 + c_skip * img
        noise = jax.random.normal(step_rng, shape, dtype=jnp.float32)
        renoised = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1.0 - a_prev) * noise
        img = jnp.where(last > 0.5, denoised, renoised)
        return (img, denoised), None

    (img, denoised), _ = jax.lax.scan(
        body,
        (img, jnp.zeros_like(img)),
        (ts_table, ap_table, app_table, last_table, step_rngs),
    )
    return denoised


class DDIMSolver:
    """Distillation-time DDIM step on the 50-step grid (`ddim_solver.py:11-35`)."""

    def __init__(
        self,
        alphas_cumprod: np.ndarray,
        timesteps: int = 1000,
        ddim_timesteps: int = 50,
    ):
        step_ratio = timesteps // ddim_timesteps
        self.step_ratio = step_ratio
        self.ddim_timesteps = (
            (np.arange(1, ddim_timesteps + 1) * step_ratio).round().astype(np.int64) - 1
        )
        acp = np.asarray(alphas_cumprod)
        self.ddim_alpha_cumprods = jnp.asarray(acp[self.ddim_timesteps], dtype=jnp.float32)
        self.ddim_alpha_cumprods_prev = jnp.asarray(
            np.concatenate([acp[:1], acp[self.ddim_timesteps[:-1]]]), dtype=jnp.float32
        )

    def ddim_step(
        self, pred_x0: jnp.ndarray, pred_noise: jnp.ndarray, timestep_index: jnp.ndarray
    ) -> jnp.ndarray:
        a_prev = _append_dims(self.ddim_alpha_cumprods_prev[timestep_index], pred_x0.ndim)
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * pred_noise
