"""TxtFlagLargeDiT (LLaMA-style parity-extra) shape/behavior tests."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.flag_dit import (
    TxtFlagLargeDiT,
    apply_rotary,
    precompute_rotary,
)


def test_rotary_matches_torch_polar():
    """LLaMA rotation: pairs rotated by angle t*freq; check vs complex mul."""
    import torch

    hd, max_len = 8, 16
    cos, sin = precompute_rotary(hd, max_len)
    x = np.random.default_rng(0).standard_normal((1, 5, 2, hd)).astype(np.float32)
    ours = np.asarray(apply_rotary(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))

    freqs = 1.0 / (10000.0 ** (torch.arange(0, hd, 2)[: hd // 2].float() / hd))
    t = torch.arange(max_len).float()
    freqs_cis = torch.polar(torch.ones_like(torch.outer(t, freqs)), torch.outer(t, freqs))
    xt = torch.from_numpy(x)
    xc = torch.view_as_complex(xt.reshape(1, 5, 2, hd // 2, 2))
    golden = torch.view_as_real(xc * freqs_cis[None, :5, None, :]).flatten(-2).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def _tiny():
    return TxtFlagLargeDiT(
        in_channels=4, context_dim=16, hidden_size=32, depth=2, num_heads=4,
        max_len=64, multiple_of=16,
    )


def test_flag_dit_shapes_and_identity_at_init():
    model = _tiny()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 12, 4))
    t = jnp.asarray([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    params = model.init(rng, x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 12, 4)
    # adaLN gates + final linear zero-init -> exact zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flag_dit_grouped_kv_heads():
    model = TxtFlagLargeDiT(
        in_channels=4, context_dim=16, hidden_size=32, depth=1, num_heads=4,
        n_kv_heads=2, max_len=64, multiple_of=16,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 4))
    params = model.init(rng, x, jnp.zeros((1,)), jnp.zeros((1, 5, 16)))
    out = model.apply(params, x, jnp.zeros((1,)), jnp.zeros((1, 5, 16)))
    assert out.shape == (1, 8, 4)
