"""Shape/behavior tests for the 1D mel VAE."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian, VAEConfig


def _tiny_cfg():
    return VAEConfig(
        in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        down_layers=(0,), attn_layers=(), kernel_size=5, z_channels=4, embed_dim=4,
    )


def test_vae_roundtrip_shapes():
    cfg = _tiny_cfg()
    model = AutoencoderKL1D(cfg)
    x = jnp.zeros((2, 16, 8))
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, x, rng)
    moments = model.apply(params, x, method=AutoencoderKL1D.encode_moments)
    assert moments.shape == (2, 8, 8)  # T/2, 2*embed_dim
    post = DiagonalGaussian(moments)
    z = post.sample(rng)
    assert z.shape == (2, 8, 4)
    rec = model.apply(params, z, method=AutoencoderKL1D.decode)
    assert rec.shape == (2, 16, 8)
    assert np.isfinite(np.asarray(rec)).all()


def test_vae_full_config_shapes():
    # production config: mel (B, 624, 80) -> latent (B, 312, 20)
    model = AutoencoderKL1D(VAEConfig())
    x = jnp.zeros((1, 64, 80))
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, x, rng)
    moments = model.apply(params, x, method=AutoencoderKL1D.encode_moments)
    assert moments.shape == (1, 32, 40)
    rec = model.apply(params, moments[..., :20], method=AutoencoderKL1D.decode)
    assert rec.shape == (1, 64, 80)


def test_diagonal_gaussian_kl_zero_for_standard_normal():
    moments = jnp.zeros((2, 4, 8))  # mean 0, logvar 0 -> KL = 0
    post = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(post.kl()), 0.0, atol=1e-6)
    assert post.mode().shape == (2, 4, 4)
