"""Fused DiT attention projections (fuse_qkv=True) must be a numerics-
preserving reparameterization: to_q/to_k/to_v concatenated into one
"to_qkv" matmul (output-column blocks of one dot reduce over K in the same
order as the separate dots; tiny atol only for XLA fusion-choice noise).

Reference behavior target unchanged: ldm/modules/new_attention.py:89-130
(the backbone itself is golden-tested in test_dit_golden.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.nn.attention import fuse_attention_params


def _randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.05,
        params,
    )


def test_dit_fused_matches_unfused():
    kw = dict(in_channels=4, context_dim=16, hidden_size=32, depth=2,
              num_heads=4, max_len=128)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 24, 4)),
                    jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((2, 10, 16)),
                      jnp.float32)
    w = jnp.asarray(np.random.default_rng(3).standard_normal((2, 256)),
                    jnp.float32)

    std = ConcatDiT2MLP(**kw)
    params = _randomize(std.init(jax.random.PRNGKey(0), x, t, ctx, w)["params"])
    y_std = std.apply({"params": params}, x, t, ctx, w)

    fused = ConcatDiT2MLP(**kw, fuse_qkv=True)
    fused_params = fuse_attention_params(params)
    y_fused = fused.apply({"params": fused_params}, x, t, ctx, w)

    # fused layout must init to the same shapes it consumes
    ref_shapes = jax.eval_shape(
        lambda: fused.init(jax.random.PRNGKey(0), x, t, ctx, w))["params"]
    assert jax.tree.map(lambda a: a.shape, fused_params) == jax.tree.map(
        lambda s: s.shape, ref_shapes)
    np.testing.assert_allclose(y_std, y_fused, atol=1e-5, rtol=0)
