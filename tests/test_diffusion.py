"""Schedule + LCM grid golden tests (values derived from the reference math)."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion import (
    LCMConfig,
    NoiseSchedule,
    boundary_scalings,
    lcm_inference_timesteps,
    lcm_sample,
)
from audiolcm_tpu.diffusion.lcm import DDIMSolver


def test_linear_schedule_matches_torch_formula():
    import torch

    sched = NoiseSchedule.linear(1000, 0.00085, 0.012)
    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    acp = torch.cumprod(1.0 - betas, dim=0)
    np.testing.assert_allclose(np.asarray(sched.betas), betas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp.numpy(), rtol=1e-5)
    # known anchors
    assert sched.num_timesteps == 1000
    assert abs(float(sched.alphas_cumprod[0]) - (1 - 0.00085)) < 1e-6


def test_lcm_timestep_grid():
    # S=2 on the 50-step grid of 1000 -> [999, 499] (scheduling_lcm.py:166-254)
    np.testing.assert_array_equal(lcm_inference_timesteps(2, 50, 1000), [999, 499])
    np.testing.assert_array_equal(lcm_inference_timesteps(1, 50, 1000), [999])
    np.testing.assert_array_equal(
        lcm_inference_timesteps(4, 50, 1000), [999, 759, 499, 259]
    )
    # the distillation grid (lcm_audio.py:100-106)
    solver = DDIMSolver(np.asarray(NoiseSchedule.linear().alphas_cumprod))
    np.testing.assert_array_equal(solver.ddim_timesteps[:3], [19, 39, 59])
    assert solver.ddim_timesteps[-1] == 999


def test_boundary_scalings():
    c_skip, c_out = boundary_scalings(jnp.asarray(0.0))
    assert abs(float(c_skip) - 1.0) < 1e-6 and abs(float(c_out)) < 1e-6
    t = 999.0
    c_skip, c_out = boundary_scalings(jnp.asarray(t))
    st = t * 10
    np.testing.assert_allclose(float(c_skip), 0.25 / (st**2 + 0.25), rtol=1e-5)
    np.testing.assert_allclose(float(c_out), st / np.sqrt(st**2 + 0.25), rtol=1e-5)


def test_q_sample_roundtrip():
    sched = NoiseSchedule.linear()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    t = jnp.asarray([10, 500])
    xt = sched.q_sample(x0, t, noise)
    x0_rec = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = sched.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)


def test_lcm_sample_identity_denoiser():
    """With eps-prediction == 0, x0-hat = x_t / sqrt(a_t); loop must be finite
    and produce the boundary-scaled blend at each step."""
    sched = NoiseSchedule.linear()

    def denoise_fn(x, t, w_emb):
        assert w_emb.shape == (x.shape[0], 256)
        return jnp.zeros_like(x)

    out = lcm_sample(
        denoise_fn,
        sched,
        jax.random.PRNGKey(0),
        (2, 16, 4),
        LCMConfig(num_inference_steps=2),
    )
    assert out.shape == (2, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_solver_step():
    sched = NoiseSchedule.linear()
    solver = DDIMSolver(np.asarray(sched.alphas_cumprod))
    x0 = jnp.ones((2, 4, 3))
    eps = jnp.zeros((2, 4, 3))
    idx = jnp.asarray([0, 10])
    out = solver.ddim_step(x0, eps, idx)
    # index 0 -> alpha_cumprod_prev = alphas_cumprod[0]
    a0 = float(sched.alphas_cumprod[0])
    np.testing.assert_allclose(np.asarray(out)[0], np.sqrt(a0), rtol=1e-6)
    a_prev = float(sched.alphas_cumprod[solver.ddim_timesteps[9]])
    np.testing.assert_allclose(np.asarray(out)[1], np.sqrt(a_prev), rtol=1e-6)
