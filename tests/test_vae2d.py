"""2D VAE / VQ variant tests."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.vae2d import (
    AutoencoderKL2D,
    VAE2DConfig,
    VectorQuantizer,
    VQModel2D,
)


def _cfg():
    return VAE2DConfig(in_channels=1, out_ch=1, ch=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,), resolution=16,
                       z_channels=4, embed_dim=4)


def test_kl2d_roundtrip_shapes():
    model = AutoencoderKL2D(_cfg())
    x = jnp.zeros((2, 16, 16, 1))
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, x, rng)
    moments = model.apply(params, x, method=AutoencoderKL2D.encode_moments)
    assert moments.shape == (2, 8, 8, 8)  # /2 spatial, 2*embed_dim
    rec, post = model.apply(params, x, rng)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_vq2d_roundtrip():
    model = VQModel2D(_cfg(), n_embed=32)
    x = jnp.zeros((1, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, loss, idx = model.apply(params, x)
    assert rec.shape == x.shape
    assert idx.shape == (1, 8, 8)
    assert np.isfinite(float(loss))


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=4, embed_dim=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 3, 2))
    params = vq.init(jax.random.PRNGKey(1), z)
    quant, loss, idx = vq.apply(params, z)
    codebook = params["params"]["embedding"]
    # every quantized vector must be a codebook entry
    q = np.asarray(quant).reshape(-1, 2)
    cb = np.asarray(codebook)
    dists = np.abs(q[:, None, :] - cb[None]).sum(-1).min(1)
    np.testing.assert_allclose(dists, 0.0, atol=1e-6)
    # straight-through: grads flow to z
    g = jax.grad(lambda z: jnp.sum(vq.apply(params, z)[0] ** 2))(z)
    assert np.abs(np.asarray(g)).max() > 0
