"""DDPM noise schedule as a pure, precomputed pytree of jnp arrays.

Behavior parity: `ldm/models/diffusion/ddpm.py:116-168` with the "linear"
beta schedule of `ldm/modules/diffusionmodules/util.py:21-25`:
betas = linspace(sqrt(b0), sqrt(b1), N)^2 with b0=0.00085, b1=0.012
(configs/audiolcm.yaml:5-6), computed in float64 then cast.

No Lightning module, no registered buffers: the schedule is a frozen
dataclass of arrays that rides along in jitted functions as closure
constants (XLA bakes them into the compiled graph).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _append_dims(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    def tree_flatten(self):
        return (tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def linear(
        cls,
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        v_posterior: float = 0.0,
    ) -> "NoiseSchedule":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, timesteps, dtype=np.float64) ** 2
        )
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = (1 - v_posterior) * betas * (1.0 - acp_prev) / (1.0 - acp) + v_posterior * betas
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(np.log(np.maximum(post_var, 1e-20))),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion q(x_t | x_0) (`ddpm.py:273-277`)."""
        nd = x_start.ndim
        return (
            _append_dims(self.sqrt_alphas_cumprod[t], nd) * x_start
            + _append_dims(self.sqrt_one_minus_alphas_cumprod[t], nd) * noise
        )

    def predict_start_from_noise(
        self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        """x0-hat from eps prediction (`ddpm.py:215-219`)."""
        nd = x_t.ndim
        return (
            _append_dims(self.sqrt_recip_alphas_cumprod[t], nd) * x_t
            - _append_dims(self.sqrt_recipm1_alphas_cumprod[t], nd) * noise
        )

    def predict_eps_from_xstart(
        self, x_t: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray
    ) -> jnp.ndarray:
        nd = x_t.ndim
        return (
            _append_dims(self.sqrt_recip_alphas_cumprod[t], nd) * x_t - x0
        ) / _append_dims(self.sqrt_recipm1_alphas_cumprod[t], nd)

    def q_posterior(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        """Posterior q(x_{t-1} | x_t, x_0) mean/var (`ddpm.py:221-228`)."""
        nd = x_t.ndim
        mean = (
            _append_dims(self.posterior_mean_coef1[t], nd) * x_start
            + _append_dims(self.posterior_mean_coef2[t], nd) * x_t
        )
        var = _append_dims(self.posterior_variance[t], nd)
        log_var = _append_dims(self.posterior_log_variance_clipped[t], nd)
        return mean, var, log_var
