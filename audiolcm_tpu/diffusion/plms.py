"""PLMS (pseudo linear multistep) sampler for the teacher LDM.

Behavior parity: `ldm/models/diffusion/plms.py:115-236` — Adams-Bashforth
multistep on the eps predictions with order ramping 1->4:
  step 0: pseudo improved Euler (2 model evals, e' = (e_t + e_next)/2)
  step 1: e' = (3 e - e_{-1}) / 2
  step 2: e' = (23 e - 16 e_{-1} + 5 e_{-2}) / 12
  step >=3: e' = (55 e - 59 e_{-1} + 37 e_{-2} - 9 e_{-3}) / 24
with the same eta=0 DDIM coefficient tables and batch-doubled CFG.

TPU-first: the eps history rides in the scan carry as a fixed (3, ...) ring
buffer; the order ramp is a branchless weighted sum driven by the step
index, so the whole loop is still one compiled scan.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.ddim import DDIMConfig, _tables
from audiolcm_tpu.diffusion.schedule import NoiseSchedule


def plms_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: NoiseSchedule,
    rng: jax.Array,
    shape: Tuple[int, ...],
    cond: jnp.ndarray,
    uncond: Optional[jnp.ndarray] = None,
    config: DDIMConfig = DDIMConfig(),
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    batch = shape[0]
    ts, alphas, alphas_prev, sigmas = _tables(schedule, config.num_steps, config.eta)
    rev = slice(None, None, -1)
    ts_rev = ts[rev].copy()
    ts_t = jnp.asarray(ts_rev, dtype=jnp.int32)
    # t_next of step i is ts_rev[i+1] (clamped at the end, plms.py:144)
    ts_next = jnp.asarray(
        list(ts_rev[1:]) + [ts_rev[-1]], dtype=jnp.int32
    )
    a_t = jnp.asarray(alphas[rev].copy(), dtype=jnp.float32)
    a_prev_t = jnp.asarray(alphas_prev[rev].copy(), dtype=jnp.float32)
    sigma_t = jnp.asarray(sigmas[rev].copy(), dtype=jnp.float32)

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

    def x_prev_from(img, e, a, a_prev, sigma, step_rng):
        pred_x0 = (img - jnp.sqrt(1.0 - a) * e) / jnp.sqrt(a)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e
        noise = sigma * jax.random.normal(step_rng, shape) * config.temperature
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise

    rng, init_rng = jax.random.split(rng)
    img = x_T if x_T is not None else jax.random.normal(init_rng, shape)
    step_rngs = jax.random.split(rng, len(ts_rev) * 2).reshape(len(ts_rev), 2, -1)

    def body(carry, inp):
        img, hist = carry  # hist: (3, *shape) ring of [e_{-1}, e_{-2}, e_{-3}]
        i, t, t_nxt, a, a_prev, sigma, rngs = inp
        t_full = jnp.full((batch,), t, dtype=jnp.int32)
        e_t = eps_fn(img, t_full)

        # step 0: pseudo improved Euler second eval
        def euler_eprime():
            x_half = x_prev_from(img, e_t, a, a_prev, sigma, rngs[0])
            t_next_full = jnp.full((batch,), t_nxt, dtype=jnp.int32)
            e_next = eps_fn(x_half, t_next_full)
            return (e_t + e_next) / 2.0

        def multistep_eprime():
            e1 = (3 * e_t - hist[0]) / 2.0
            e2 = (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12.0
            e3 = (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24.0
            return jnp.where(i == 1, e1, jnp.where(i == 2, e2, e3))

        e_prime = jax.lax.cond(i == 0, euler_eprime, multistep_eprime)
        img = x_prev_from(img, e_prime, a, a_prev, sigma, rngs[1])
        hist = jnp.concatenate([e_t[None], hist[:2]], axis=0)
        return (img, hist), None

    idx = jnp.arange(len(ts_rev), dtype=jnp.int32)
    hist0 = jnp.zeros((3,) + shape, dtype=img.dtype)
    (img, _), _ = jax.lax.scan(
        body, (img, hist0), (idx, ts_t, ts_next, a_t, a_prev_t, sigma_t, step_rngs)
    )
    return img
