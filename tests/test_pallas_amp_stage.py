"""Layer-by-layer validation of the fused AMP-stage path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import AMPBlock1
from audiolcm_tpu.nn.pallas_amp_stage import (
    R_ACT,
    extract_stage_params,
    fused_amp_stage,
    stage_radius,
    stage_valid,
    valid_alias_free_snake,
    valid_conv,
)
from audiolcm_tpu.nn.resample import alias_free_activation
from audiolcm_tpu.nn.snake import snake_beta


def test_valid_alias_free_snake_matches_padded_interior(rng):
    c = 5
    x = jnp.asarray(rng.standard_normal((128, c)).astype(np.float32))
    alpha = jnp.exp(jnp.asarray(rng.standard_normal(c).astype(np.float32)))
    beta = jnp.exp(jnp.asarray(rng.standard_normal(c).astype(np.float32)))
    padded = np.asarray(
        alias_free_activation(x[None], lambda h: snake_beta(h, alpha, beta))
    )[0]
    valid = np.asarray(valid_alias_free_snake(x, alpha, beta))
    assert valid.shape == (128 - 2 * R_ACT, c)
    np.testing.assert_allclose(valid, padded[R_ACT:-R_ACT], atol=1e-5)


@pytest.mark.parametrize("dilation", [1, 3, 5])
def test_valid_conv_matches_same_conv_interior(rng, dilation):
    import flax.linen as nn

    c, k = 4, 11
    x = jnp.asarray(rng.standard_normal((128, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    pad = (k * dilation - dilation) // 2
    conv = nn.Conv(c, kernel_size=(k,), padding=[(pad, pad)], kernel_dilation=(dilation,))
    padded = np.asarray(
        conv.apply({"params": {"kernel": w, "bias": bias}}, x[None])
    )[0]
    valid = np.asarray(valid_conv(x, w, bias, dilation))
    r = (k - 1) * dilation // 2
    np.testing.assert_allclose(valid, padded[r:-r], atol=2e-4)


def _make_stage(rng, c=6, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5), t=1024):
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    amp_params = []
    key = jax.random.PRNGKey(0)
    modules = []
    for k in kernel_sizes:
        m = AMPBlock1(k, dilations)
        p = m.init(key, x)["params"]
        modules.append(m)
        amp_params.append(p)

    def reference_fn(xb):
        acc = None
        for m, p in zip(modules, amp_params):
            h = m.apply({"params": p}, xb)
            acc = h if acc is None else acc + h
        return acc / len(modules)

    return x, amp_params, reference_fn


def test_stage_valid_matches_reference_interior(rng):
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    x, amp_params, reference_fn = _make_stage(rng, kernel_sizes=kernel_sizes)
    sp = extract_stage_params(amp_params, len(dilations))
    r = stage_radius(kernel_sizes, dilations)
    golden = np.asarray(reference_fn(x))
    valid = np.asarray(
        jnp.stack([stage_valid(x[i], sp, kernel_sizes, dilations) for i in range(2)])
    )
    assert valid.shape[1] == x.shape[1] - 2 * r
    np.testing.assert_allclose(valid, golden[:, r:-r, :], atol=5e-4)


def test_fused_amp_stage_matches_reference_everywhere(rng):
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    x, amp_params, reference_fn = _make_stage(rng, t=2048, kernel_sizes=kernel_sizes)
    sp = extract_stage_params(amp_params, len(dilations))
    golden = np.asarray(reference_fn(x))
    out = np.asarray(
        fused_amp_stage(
            x, sp, kernel_sizes, dilations, reference_fn=reference_fn,
            tile=512, interpret=True,
        )
    )
    np.testing.assert_allclose(out, golden, atol=5e-4)


def test_fused_amp_stage_cl_matches_reference(rng):
    from audiolcm_tpu.nn.pallas_amp_stage import fused_amp_stage_cl

    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    x, amp_params, reference_fn = _make_stage(rng, t=2048, kernel_sizes=kernel_sizes)
    sp = extract_stage_params(amp_params, len(dilations))
    golden = np.asarray(reference_fn(x))
    out = np.asarray(
        fused_amp_stage_cl(
            x, sp, kernel_sizes, dilations, reference_fn=reference_fn,
            tile=512, interpret=True,
        )
    )
    np.testing.assert_allclose(out, golden, atol=5e-4)


@pytest.mark.parametrize("conv", ["tap", "mstack", "kstack"])
def test_fused_amp_stage_cl_batched_matches_reference(rng, conv):
    """All conv formulations (per-tap dots / one M-stacked dot + shifted
    adds / one K-stacked dot over rotate-normalized blocks at Cp-padded
    channels) must match the padded module path bit-comparably."""
    from audiolcm_tpu.nn.pallas_amp_stage import fused_amp_stage_cl_batched

    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    x, amp_params, reference_fn = _make_stage(rng, t=2048, kernel_sizes=kernel_sizes)
    sp = extract_stage_params(amp_params, len(dilations))
    golden = np.asarray(reference_fn(x))
    out = np.asarray(
        fused_amp_stage_cl_batched(
            x, sp, kernel_sizes, dilations, reference_fn=reference_fn,
            tile=512, interpret=True, conv=conv,
        )
    )
    np.testing.assert_allclose(out, golden, atol=5e-4)


@pytest.mark.parametrize("accum", ["bf16", "f32"])
def test_fused_stage_bf16_error_not_worse_than_xla_path(rng, accum):
    """VERDICT round-1 #3: in bf16 the fused path must be at least as
    accurate as the per-op-rounding XLA path. accum="f32" (FIR/average
    accumulators in f32, XLA-matching rounding points) guarantees this at
    every scale; the default "bf16" path matches at this test scale and
    carries 0.28%-of-scale mean error (vs XLA's 0.09%) at the production
    T=160k shapes — the f32 knob exists for callers that need parity there
    (it measured ~30% slower end-to-end, DESIGN.md "Fused-stage numerics")."""
    from audiolcm_tpu.nn.pallas_amp_stage import fused_amp_stage_cl_batched

    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    x, amp_params, reference_fn = _make_stage(rng, t=2048, kernel_sizes=kernel_sizes)
    sp = extract_stage_params(amp_params, len(dilations))
    golden = np.asarray(reference_fn(x)).astype(np.float64)
    scale = np.abs(golden).mean()

    bf16 = jnp.bfloat16
    x_b = x.astype(bf16)
    amp_b = jax.tree.map(lambda v: v.astype(bf16), amp_params)
    sp_b = extract_stage_params(amp_b, len(dilations))

    def reference_fn_b(xb):
        from audiolcm_tpu.models.bigvgan import AMPBlock1

        acc = None
        for k, p in zip(kernel_sizes, amp_b):
            h = AMPBlock1(k, dilations).apply({"params": p}, xb)
            acc = h if acc is None else acc + h
        return acc / len(kernel_sizes)

    xla_err = np.abs(
        np.asarray(reference_fn_b(x_b)).astype(np.float64) - golden
    ).mean() / scale
    fused = fused_amp_stage_cl_batched(
        x_b, sp_b, kernel_sizes, dilations, reference_fn=reference_fn_b,
        tile=512, interpret=True, accum=accum,
    )
    fused_err = np.abs(np.asarray(fused).astype(np.float64) - golden).mean() / scale
    assert fused.dtype == bf16
    # boundary strips reuse the XLA path, so parity there; the f32-accumulated
    # interior must pull the mean at or below the XLA path's error
    assert fused_err <= xla_err * 1.02, (fused_err, xla_err)


def test_fused_stage_fallback_without_reference_fn_raises(rng):
    kernel_sizes, dilations = (3, 7), (1, 3)
    x, amp_params, _ = _make_stage(rng, t=1000, kernel_sizes=kernel_sizes,
                                   dilations=dilations)
    sp = extract_stage_params(amp_params, len(dilations))
    with pytest.raises(ValueError, match="divisible"):
        fused_amp_stage(x, sp, kernel_sizes, dilations, reference_fn=None,
                        tile=512, interpret=True)


def test_fused_stage_fast_cos_close(rng):
    """fast=True (polynomial cos) stays within float tolerance of exact."""
    from audiolcm_tpu.nn.pallas_amp_stage import stage_valid

    kernel_sizes, dilations = (3, 7), (1, 3)
    x, amp_params, _ = _make_stage(rng, t=512, kernel_sizes=kernel_sizes,
                                   dilations=dilations)
    sp = extract_stage_params(amp_params, len(dilations))
    exact = np.asarray(stage_valid(x[0], sp, kernel_sizes, dilations))
    fast = np.asarray(stage_valid(x[0], sp, kernel_sizes, dilations, fast=True))
    np.testing.assert_allclose(fast, exact, atol=1e-4)


def test_bigvgan_pallas_stage_matches_module_path(rng):
    """Full BigVGAN with the serving pallas_stage_max_channels knob equals the
    plain module path (interpret mode; same param tree, so checkpoints are
    knob-agnostic)."""
    from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    cfg = BigVGANConfig()
    mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32)) * 0.3
    plain = BigVGAN(cfg)
    fused = BigVGAN(cfg, pallas_stage_max_channels=24, pallas_interpret=True)

    params = plain.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_structure(
        jax.eval_shape(lambda: fused.init(jax.random.PRNGKey(0), mel))
    ) == jax.tree_util.tree_structure(params)

    golden = np.asarray(plain.apply(params, mel))
    out = np.asarray(fused.apply(params, mel))
    assert out.shape == golden.shape
    np.testing.assert_allclose(out, golden, atol=2e-5)


def test_pick_stage_tile_production_shapes():
    """Every late stage of the production 10 s shape (T = 312*2^k) must get a
    legal fused tile under the constant C*tile compile budget — C=96 had none
    while the floor was 2048 (divisors of 312 jump 13 -> 24) and silently fell
    back to XLA (round-2 regression)."""
    from audiolcm_tpu.models.bigvgan import _pick_stage_tile

    for ch, t, expect in ((24, 159744, 9984), (48, 79872, 4992),
                          (96, 39936, 1664), (192, 19968, 1664)):
        mt = max(2048, (9984 * 24 // ch) // 128 * 128)
        tile = _pick_stage_tile(t, max_tile=mt)
        assert tile == expect, (ch, tile)
        assert t % tile == 0 and t >= 2 * tile


def test_every_lattice_bucket_has_efficient_fused_tiles():
    """Round-4 guard: every mel bucket in the serving lattice must give the
    two fused stages (C=24 at T=256*B, C=48 at T=128*B) a legal Pallas tile
    with bounded halo overhead. 628 failed this (256*628 = 2^10*157 caps the
    tile at 1024/512 -> 25-50%% of each loaded window is halo on 35%% of
    device time) and was replaced by 640 in the lattice."""
    from audiolcm_tpu.data.buckets import DEFAULT_MEL_BUCKETS
    from audiolcm_tpu.models.bigvgan import _pick_stage_tile

    for b in DEFAULT_MEL_BUCKETS:
        for ch, t in ((24, 256 * b), (48, 128 * b)):
            mt = max(2048, (9984 * 24 // ch) // 128 * 128)
            tile = _pick_stage_tile(t, max_tile=mt)
            assert tile, (b, ch, "no legal fused tile")
            halo_frac = 256 / (tile + 256)
            assert halo_frac <= 0.12, (b, ch, tile, halo_frac)
