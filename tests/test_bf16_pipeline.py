"""bf16 serving-path tests: cast_params + compute_dtype produce finite,
close-to-f32 audio on the tiny pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.pipeline import cast_params
from tests.test_pipeline import tiny_pipeline


def test_cast_params_leaves():
    pipe = tiny_pipeline(with_text=False)
    bf16 = cast_params(pipe.params, jnp.bfloat16)
    leaves = [l for l in jax.tree.leaves(bf16) if hasattr(l, "dtype")]
    float_leaves = [l for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)]
    assert float_leaves and all(l.dtype == jnp.bfloat16 for l in float_leaves)


def test_bf16_generate_close_to_f32():
    pipe = tiny_pipeline(with_text=False)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    wav32, _ = pipe.generate_from_context(jax.random.PRNGKey(0), ctx, 8)

    pipe.params = cast_params(pipe.params, jnp.bfloat16)
    pipe.compute_dtype = jnp.bfloat16
    wav16, mel16 = pipe.generate_from_context(
        jax.random.PRNGKey(0), ctx.astype(jnp.bfloat16), 8
    )
    assert wav16.dtype == jnp.float32  # output cast back
    assert np.isfinite(np.asarray(wav16)).all()
    # same rng path; bf16 noise differs slightly but wave must stay close
    assert np.abs(np.asarray(wav16) - np.asarray(wav32)).mean() < 0.05
