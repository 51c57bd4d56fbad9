"""Data-parallel batched inference over the 8-device virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audiolcm_tpu.parallel import make_mesh
from tests.test_pipeline import tiny_pipeline


def test_generate_with_sharded_batch():
    pipe = tiny_pipeline(with_text=False)
    mesh = make_mesh(8)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    ctx = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (16, 6, 16)), data
    )
    params = jax.device_put(pipe.params, repl)

    gen = jax.jit(pipe._generate_from_context, static_argnums=(3,))
    with mesh:
        wav, mel = gen(params, jax.random.PRNGKey(0), ctx, 8)
    assert wav.shape == (16, 128)
    assert np.isfinite(np.asarray(wav)).all()
    # output stays sharded along the batch/data axis
    assert len(wav.sharding.device_set) == 8
