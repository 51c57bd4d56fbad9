"""Shape/invariant tests for the ConcatDiT2MLP backbone."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.dit import ConcatDiT2MLP, TimestepEmbedder
from audiolcm_tpu.nn.embeddings import guidance_scale_embedding, timestep_embedding


def _tiny_model():
    return ConcatDiT2MLP(
        in_channels=4, context_dim=16, hidden_size=32, depth=2, num_heads=4, max_len=128
    )


def test_dit_forward_shapes():
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 24, 4))
    t = jnp.asarray([999, 499])
    ctx = jnp.zeros((2, 10, 16))  # 2 halves of 5 tokens
    w = guidance_scale_embedding(jnp.asarray([4.0, 4.0]), 256)
    params = model.init(rng, x, t, ctx, w)
    out = model.apply(params, x, t, ctx, w)
    assert out.shape == (2, 24, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_w_cond_changes_output():
    # NOTE: at init every block's proj_out is zero (parity with the reference's
    # zero_module), making blocks identity maps; the timestep/w token is sliced
    # off before the head, so w only matters with non-zero block weights.
    # Randomize all params to probe the trained-model behavior.
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 24, 4))
    t = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 16))
    w1 = guidance_scale_embedding(jnp.asarray([4.0]), 256)
    w2 = guidance_scale_embedding(jnp.asarray([11.0]), 256)
    params = model.init(rng, x, t, ctx, w1)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )
    o1 = model.apply(params, x, t, ctx, w1)
    o2 = model.apply(params, x, t, ctx, w2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6


def test_timestep_embedding_matches_torch_formula():
    import math

    import torch

    t = np.asarray([0.0, 1.0, 999.0], dtype=np.float32)
    half = 128
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(0, half, dtype=torch.float32) / half
    )
    args = torch.from_numpy(t)[:, None] * freqs[None]
    golden = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    np.testing.assert_allclose(ours, golden, atol=1e-3)


def test_guidance_embedding_matches_torch_formula():
    import torch

    w = np.asarray([4.0], dtype=np.float32)
    tw = torch.from_numpy(w) * 1000.0
    half = 128
    emb = torch.log(torch.tensor(10000.0)) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    emb = tw[:, None] * emb[None, :]
    golden = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1).numpy()
    ours = np.asarray(guidance_scale_embedding(jnp.asarray(w), 256))
    np.testing.assert_allclose(ours, golden, atol=1e-3)


def test_timestep_embedder_uses_w_cond():
    emb = TimestepEmbedder(hidden_size=32)
    t = jnp.asarray([10.0])
    w = guidance_scale_embedding(jnp.asarray([4.0]), 256)
    params = emb.init(jax.random.PRNGKey(0), t, w)
    with_w = emb.apply(params, t, w)
    without_w = emb.apply(params, t, None)
    assert with_w.shape == (1, 32)
    assert np.abs(np.asarray(with_w - without_w)).max() > 1e-6
