"""Dynamic-int8 conv serving knob (nn/int8_conv.py).

Checks (1) the int8 conv matches the f32 conv to quantization-level error,
(2) AMPBlock1's param tree is byte-identical with the knob on (checkpoints
are knob-agnostic), (3) the int8 block output stays close to the exact
block in bf16 (the serving dtype)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolcm_tpu.models.bigvgan import AMPBlock1, _conv1d
from audiolcm_tpu.nn.int8_conv import int8_conv1d_cl


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.mark.parametrize("dilation", [1, 3])
def test_int8_conv_matches_f32_conv(rng, dilation):
    b, t, c, k = 2, 96, 64, 11
    r1, r2, r3 = jax.random.split(rng, 3)
    x = jax.random.normal(r1, (b, t, c), jnp.float32)
    conv = _conv1d(c, k, dilation)
    params = conv.init(r2, x)
    golden = np.asarray(conv.apply(params, x), np.float64)

    w = params["params"]["kernel"]
    bias = params["params"]["bias"]
    out = np.asarray(int8_conv1d_cl(x, w, bias, dilation), np.float64)

    scale = np.abs(golden).mean()
    err = np.abs(out - golden).mean() / scale
    # int8 symmetric quantization of near-normal tensors: ~1% of scale
    assert err < 0.02, err


def test_amp_block_param_tree_knob_agnostic(rng):
    x = jax.random.normal(rng, (1, 64, 32))
    p_exact = AMPBlock1(3, (1, 3, 5)).init(rng, x)
    p_int8 = AMPBlock1(3, (1, 3, 5), int8_convs=True).init(rng, x)
    assert jax.tree.structure(p_exact) == jax.tree.structure(p_int8)
    for a, b in zip(jax.tree.leaves(p_exact), jax.tree.leaves(p_int8)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_int8_amp_block_close_to_exact_in_bf16(rng):
    """In the bf16 serving config the int8 block's deviation from the exact
    f32 block must stay within a few x of the bf16 block's own deviation."""
    r1, r2 = jax.random.split(rng)
    x = jax.random.normal(r1, (1, 128, 32), jnp.float32)
    block = AMPBlock1(3, (1, 3, 5))
    params = block.init(r2, x)
    golden = np.asarray(block.apply(params, x), np.float64)
    scale = np.abs(golden).mean()

    bf16 = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    out_bf16 = np.asarray(
        block.apply(bf16(params), x.astype(jnp.bfloat16)), np.float64)
    err_bf16 = np.abs(out_bf16 - golden).mean() / scale

    block8 = AMPBlock1(3, (1, 3, 5), int8_convs=True)
    out_int8 = np.asarray(
        block8.apply(bf16(params), x.astype(jnp.bfloat16)), np.float64)
    err_int8 = np.abs(out_int8 - golden).mean() / scale

    assert err_int8 < max(4 * err_bf16, 0.02), (err_int8, err_bf16)
