"""Alias-free resampling golden tests vs torch equations + BigVGAN shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.nn.resample import (
    downsample1d,
    kaiser_sinc_filter1d,
    upsample1d,
)
from audiolcm_tpu.nn.snake import snake_beta


def _torch_kaiser_sinc(cutoff, half_width, kernel_size):
    """Reference equation (filter.py:28-57) re-derived with torch."""
    import math

    import torch

    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt


def test_kaiser_sinc_filter_matches_torch():
    for ratio in (2, 4):
        ours = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, 12)
        golden = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, 12).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-6)


def test_upsample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    ratio, ks = 2, 12
    x = rng.standard_normal((2, 32, 3)).astype(np.float32)
    ours = np.asarray(upsample1d(jnp.asarray(x), ratio, ks))

    # torch reference (resample.py:10-33)
    xt = torch.from_numpy(x.transpose(0, 2, 1))  # (B,C,T)
    filt = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, ks).view(1, 1, ks)
    stride = ratio
    pad = ks // ratio - 1
    pad_left = pad * stride + (ks - stride) // 2
    pad_right = pad * stride + (ks - stride + 1) // 2
    xp = F.pad(xt, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(xp, filt.expand(3, -1, -1), stride=stride, groups=3)
    y = y[..., pad_left:-pad_right]
    golden = y.numpy().transpose(0, 2, 1)

    assert ours.shape == golden.shape == (2, 64, 3)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_downsample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    ratio, ks = 2, 12
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    ours = np.asarray(downsample1d(jnp.asarray(x), ratio, ks))

    xt = torch.from_numpy(x.transpose(0, 2, 1))
    filt = _torch_kaiser_sinc(0.5 / ratio, 0.6 / ratio, ks).view(1, 1, ks)
    even = ks % 2 == 0
    pad_left = ks // 2 - int(even)
    pad_right = ks // 2
    xp = F.pad(xt, (pad_left, pad_right), mode="replicate")
    y = F.conv1d(xp, filt.expand(3, -1, -1), stride=ratio, groups=3)
    golden = y.numpy().transpose(0, 2, 1)

    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_snake_beta_matches_torch(rng):
    import torch

    x = rng.standard_normal((2, 16, 4)).astype(np.float32)
    alpha = rng.standard_normal(4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32)
    ours = np.asarray(
        snake_beta(jnp.asarray(x), jnp.exp(jnp.asarray(alpha)), jnp.exp(jnp.asarray(beta)))
    )
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    a = torch.exp(torch.from_numpy(alpha))[None, :, None]
    b = torch.exp(torch.from_numpy(beta))[None, :, None]
    golden = (xt + (1.0 / (b + 1e-9)) * torch.sin(xt * a) ** 2).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_bigvgan_tiny_shapes():
    cfg = BigVGANConfig(
        num_mels=8,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    model = BigVGAN(cfg)
    mel = jnp.zeros((1, 16, 8))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 16 * 8)
    assert np.isfinite(np.asarray(wav)).all()


def test_conv_transpose_parity(rng):
    import torch
    import torch.nn.functional as F

    from audiolcm_tpu.models.bigvgan import ConvTranspose1dTorchParity

    k, u, cin, cout = 8, 4, 3, 5
    x = rng.standard_normal((2, 16, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 2, 1))
    golden = (
        F.conv_transpose1d(xt, torch.from_numpy(w), stride=u, padding=(k - u) // 2)
        .numpy()
        .transpose(0, 2, 1)
    )

    mod = ConvTranspose1dTorchParity(cout, k, u)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch (in, out, K) -> lax HIO (K, in, out) with time flipped
    lax_kernel = jnp.asarray(np.flip(w, axis=-1).transpose(2, 0, 1).copy())
    params = {"params": {"kernel": lax_kernel, "bias": jnp.zeros((cout,))}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    assert ours.shape == golden.shape == (2, 64, cout)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_polyphase_resample_matches_conv_path(rng):
    """The TPU-fast polyphase shift-add path must match the transposed/
    strided conv reference path exactly."""
    from audiolcm_tpu.nn.resample import (
        downsample1d_polyphase,
        upsample1d_polyphase,
    )

    x = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(upsample1d_polyphase(x, 2)), np.asarray(upsample1d(x, 2)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(downsample1d_polyphase(x, 2)), np.asarray(downsample1d(x, 2)),
        atol=1e-5,
    )


def test_fused_alias_free_matches_conv_path(rng):
    """The analytically-fused down(act(up)) path (BigVGAN's default) must
    match the step-by-step conv path exactly, including boundaries."""
    from audiolcm_tpu.nn.resample import (
        alias_free_activation,
        alias_free_activation_fused,
    )

    x = jnp.asarray(rng.standard_normal((2, 96, 5)).astype(np.float32))
    act = lambda h: h + 0.5 * jnp.sin(1.3 * h) ** 2
    a = np.asarray(alias_free_activation(x, act))
    b = np.asarray(alias_free_activation_fused(x, act))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_channels_first_amp_block_matches_channels_last(rng):
    """The cf path must be numerics- and PARAM-identical to channels-last."""
    from audiolcm_tpu.models.bigvgan import AMPBlock1

    x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    cl = AMPBlock1(11, (1, 3, 5))
    cf = AMPBlock1(11, (1, 3, 5), channels_first=True)
    params = cl.init(jax.random.PRNGKey(0), x)
    # param trees must be interchangeable
    params_cf = cf.init(jax.random.PRNGKey(0), jnp.transpose(x, (0, 2, 1)))
    spec = lambda p: jax.tree.map(lambda a: a.shape, p)
    assert spec(params) == spec(params_cf)

    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree.unflatten(
        td, [0.1 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    out_cl = cl.apply(params, x)
    out_cf = jnp.transpose(cf.apply(params, jnp.transpose(x, (0, 2, 1))), (0, 2, 1))
    np.testing.assert_allclose(np.asarray(out_cf), np.asarray(out_cl), atol=2e-4)


def test_bigvgan_cf_stages_match_cl(rng):
    """Full generator with cf stages enabled vs disabled: same output."""
    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    mel = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32) * 0.3)
    m_cf = BigVGAN(cfg, cf_max_channels=96)
    m_cl = BigVGAN(cfg, cf_max_channels=0)
    params = m_cl.init(jax.random.PRNGKey(0), mel)
    np.testing.assert_allclose(
        np.asarray(m_cf.apply(params, mel)), np.asarray(m_cl.apply(params, mel)),
        atol=2e-4,
    )


def test_fast_cos_accuracy():
    """Polynomial cos (serving fast path): error stays below 1e-6 in f32
    across the snake argument range, including large args (Cody-Waite)."""
    from audiolcm_tpu.nn.snake import fast_cos

    r = np.random.default_rng(0)
    for scale in (3.0, 300.0, 3000.0):
        v = (r.standard_normal(100_000) * scale).astype(np.float32)
        ours = np.asarray(fast_cos(jnp.asarray(v)))
        golden = np.cos(v.astype(np.float64)).astype(np.float32)
        assert np.max(np.abs(ours - golden)) < 1e-6


def test_fast_snake_matches_exact(rng):
    """fast_snake: elementwise error ~1e-6; the full generator output (both
    layouts) stays within float tolerance of the exact-cos path."""
    x = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32) * 3.0)
    alpha = jnp.exp(jnp.asarray(rng.standard_normal(4).astype(np.float32)))
    beta = jnp.exp(jnp.asarray(rng.standard_normal(4).astype(np.float32)))
    exact = np.asarray(snake_beta(x, alpha, beta))
    fast = np.asarray(snake_beta(x, alpha, beta, fast=True))
    np.testing.assert_allclose(fast, exact, atol=2e-6)

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    mel = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32) * 0.3)
    import dataclasses

    fast_cfg = dataclasses.replace(cfg, fast_snake=True)
    for cf_max in (0, 96):  # channels-last and channels-first stage paths
        m_exact = BigVGAN(cfg, cf_max_channels=cf_max)
        m_fast = BigVGAN(fast_cfg, cf_max_channels=cf_max)
        params = m_exact.init(jax.random.PRNGKey(0), mel)
        np.testing.assert_allclose(
            np.asarray(m_fast.apply(params, mel)),
            np.asarray(m_exact.apply(params, mel)),
            atol=1e-4,
        )
