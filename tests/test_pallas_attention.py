"""Flash-attention kernel numerics vs the XLA einsum reference (interpret
mode on the CPU mesh; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.attention import dot_product_attention
from audiolcm_tpu.nn.pallas_attention import flash_attention


@pytest.mark.parametrize("t", [128, 467, 300])
def test_flash_attention_matches_reference(t):
    b, h, d = 1, 2, 72
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, t, d))
    k = jax.random.normal(kk, (b, h, t, d))
    v = jax.random.normal(kv, (b, h, t, d))
    scale = d**-0.5
    golden = dot_product_attention(q, k, v, scale)
    ours = flash_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)


def test_flash_attention_padding_is_ignored():
    """Output for a length-T sequence must not depend on the padded tail."""
    b, h, t, d = 1, 1, 100, 8
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (b, h, t, d))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, t, d))
    out = flash_attention(q, k, v, d**-0.5, interpret=True)
    golden = dot_product_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), atol=2e-5)
