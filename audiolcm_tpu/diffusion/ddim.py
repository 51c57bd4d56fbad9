"""DDIM sampler for the teacher LDM (100-step eval path).

Behavior parity: `ldm/models/diffusion/ddim.py`:
  * `make_ddim_timesteps('uniform')` grid = range(0, N, N//S) + 1
    (`diffusionmodules/util.py:46-60`)
  * eta-sigmas `make_ddim_sampling_parameters` (`util.py:63-75`)
  * classifier-free guidance by batch-doubling cat([uc, c]) and
    e = e_uncond + s*(e_cond - e_uncond) (`ddim.py:183-205`)
  * update x_prev = sqrt(a_prev) x0 + sqrt(1-a_prev-sigma^2) e + sigma*z
    (`ddim.py:211-232`)

TPU-first: the S-step loop is a lax.scan over static per-step coefficient
tables; CFG runs as one batch-doubled DiT forward per step so the MXU sees
a 2B batch instead of two launches.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.diffusion.schedule import NoiseSchedule


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int = 1000) -> np.ndarray:
    c = num_ddpm_steps // num_ddim_steps
    return np.asarray(list(range(0, num_ddpm_steps, c))) + 1


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_steps: int = 100
    eta: float = 0.0
    guidance_scale: float = 1.0
    temperature: float = 1.0


def _tables(schedule: NoiseSchedule, num_steps: int, eta: float):
    acp = np.asarray(jax.device_get(schedule.alphas_cumprod), dtype=np.float64)
    ts = make_ddim_timesteps(num_steps, schedule.num_timesteps)
    # NOTE (reference quirk, util.py:58): the +1 grid indexes acp at ts-…?
    # ddim.py uses alphas_cumprod[ddim_timesteps] directly.
    ts = np.clip(ts, 0, schedule.num_timesteps - 1)
    alphas = acp[ts]
    alphas_prev = np.concatenate([acp[:1], acp[ts[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return ts, alphas, alphas_prev, sigmas


def ddim_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: NoiseSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    cond: jnp.ndarray,
    uncond: Optional[jnp.ndarray] = None,
    config: DDIMConfig = DDIMConfig(),
    x_T: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """denoise_fn(x, t, context) -> eps. Returns the final sample.

    If uncond is given and guidance_scale != 1, runs batch-doubled CFG.
    mask/x0 enable inpainting (`plms.py:146-149` / the inpaint LDM variant):
    at every step the known region is re-imposed as q_sample(x0, t) * mask
    before denoising (mask==1 -> keep x0's content).
    """
    batch = shape[0]
    ts, alphas, alphas_prev, sigmas = _tables(schedule, config.num_steps, config.eta)
    # descending time order
    order = slice(None, None, -1)
    ts_t = jnp.asarray(ts[order].copy(), dtype=jnp.int32)
    a_t = jnp.asarray(alphas[order].copy(), dtype=jnp.float32)
    a_prev_t = jnp.asarray(alphas_prev[order].copy(), dtype=jnp.float32)
    sigma_t = jnp.asarray(sigmas[order].copy(), dtype=jnp.float32)

    use_cfg = uncond is not None and config.guidance_scale != 1.0

    def eps_fn(x, t_full):
        if not use_cfg:
            return denoise_fn(x, t_full, cond)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_full, t_full], axis=0)
        c2 = jnp.concatenate([jnp.broadcast_to(uncond, cond.shape), cond], axis=0)
        e = denoise_fn(x2, t2, c2)
        e_u, e_c = jnp.split(e, 2, axis=0)
        return e_u + config.guidance_scale * (e_c - e_u)

    rng, init_rng = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_rng, shape)
    step_rngs = jax.random.split(rng, len(ts))

    def body(img, inp):
        t, a, a_prev, sigma, step_rng = inp
        t_full = jnp.full((batch,), t, dtype=jnp.int32)
        if mask is not None:
            noise_rng = jax.random.fold_in(step_rng, 1)
            img_orig = schedule.q_sample(
                x0, t_full, jax.random.normal(noise_rng, shape)
            )
            img = img_orig * mask + (1.0 - mask) * img
        e_t = eps_fn(img, t_full)
        pred_x0 = (img - jnp.sqrt(1.0 - a) * e_t) / jnp.sqrt(a)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
        noise = sigma * jax.random.normal(step_rng, shape) * config.temperature
        img = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return img, None

    img, _ = jax.lax.scan(body, img, (ts_t, a_t, a_prev_t, sigma_t, step_rngs))
    return img
