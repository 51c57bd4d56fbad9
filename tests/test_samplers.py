"""DDIM / PLMS sampler tests: grid goldens + analytic-denoiser behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.ddim import DDIMConfig, ddim_sample, make_ddim_timesteps, _tables
from audiolcm_tpu.diffusion.plms import plms_sample
from audiolcm_tpu.diffusion.schedule import NoiseSchedule


def test_ddim_uniform_grid():
    # util.py:46-60: range(0, 1000, 10) + 1 for 100 steps
    ts = make_ddim_timesteps(100, 1000)
    assert ts[0] == 1 and ts[-1] == 991 and len(ts) == 100
    np.testing.assert_array_equal(ts[:3], [1, 11, 21])


def test_ddim_sigma_zero_for_eta0():
    sched = NoiseSchedule.linear()
    _, _, _, sigmas = _tables(sched, 100, eta=0.0)
    np.testing.assert_allclose(sigmas, 0.0)


def test_ddim_perfect_denoiser_recovers_x0():
    """If eps-prediction is the exact noise for a known x0, DDIM must walk
    back to x0 (eta=0 deterministic path)."""
    sched = NoiseSchedule.linear()
    x0 = jnp.ones((1, 8, 2)) * 0.7

    def denoise_fn(x, t, cond):
        # exact eps implied by x_t and the true x0
        return sched.predict_eps_from_xstart(x, t, jnp.broadcast_to(x0, x.shape))

    out = ddim_sample(
        denoise_fn, sched, jax.random.PRNGKey(0), (1, 8, 2),
        cond=jnp.zeros((1, 2, 4)), config=DDIMConfig(num_steps=50),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.15)


def test_plms_perfect_denoiser_recovers_x0():
    sched = NoiseSchedule.linear()
    x0 = jnp.ones((1, 8, 2)) * -0.4

    def denoise_fn(x, t, cond):
        return sched.predict_eps_from_xstart(x, t, jnp.broadcast_to(x0, x.shape))

    out = plms_sample(
        denoise_fn, sched, jax.random.PRNGKey(0), (1, 8, 2),
        cond=jnp.zeros((1, 2, 4)), config=DDIMConfig(num_steps=50),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.15)


def test_ddim_cfg_batch_doubling():
    sched = NoiseSchedule.linear()
    calls = []

    def denoise_fn(x, t, cond):
        calls.append((x.shape, cond.shape))
        return jnp.zeros_like(x)

    cond = jnp.ones((2, 3, 4))
    uncond = jnp.zeros((1, 3, 4))
    out = ddim_sample(
        denoise_fn, sched, jax.random.PRNGKey(0), (2, 8, 2),
        cond=cond, uncond=uncond,
        config=DDIMConfig(num_steps=10, guidance_scale=5.0),
    )
    assert out.shape == (2, 8, 2)
    # traced once inside scan with doubled batch
    assert calls[0][0][0] == 4 and calls[0][1][0] == 4


def test_ddim_inpainting_keeps_masked_region():
    """mask/x0 inpainting (ddpm_audio_inpaint parity): the known region must
    reconstruct x0 while the free region is generated."""
    sched = NoiseSchedule.linear()
    x0 = jnp.ones((1, 16, 2)) * 0.6
    mask = jnp.zeros((1, 16, 2)).at[:, :8, :].set(1.0)  # first half known

    def denoise_fn(x, t, cond):
        return sched.predict_eps_from_xstart(x, t, jnp.broadcast_to(x0, x.shape))

    out = ddim_sample(
        denoise_fn, sched, jax.random.PRNGKey(0), (1, 16, 2),
        cond=jnp.zeros((1, 2, 4)), config=DDIMConfig(num_steps=50),
        mask=mask, x0=x0,
    )
    np.testing.assert_allclose(np.asarray(out)[:, :8], 0.6, atol=0.2)
    assert np.isfinite(np.asarray(out)).all()
