"""Fused text-tower projections (fuse_proj=True) must be a numerics-
preserving reparameterization of the standard layout: Q/K/V (and T5's
gated-FF wi_0/wi_1) concatenated into single wider matmuls. Output-column
blocks of one matmul reduce over K in the same order as the separate
matmuls, so outputs must match to float tolerance (bitwise on CPU is not
guaranteed across XLA fusion choices, hence the tiny atol).

Reference behavior target unchanged: ldm/modules/encoders/modules.py:567-582
(the towers themselves are golden-tested in test_text_encoders.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.clap_text import (
    BertConfig,
    ClapTextEncoder,
    fuse_bert_params,
)
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder, fuse_t5_params


def _randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.05,
        params,
    )


def test_bert_fused_matches_unfused():
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 120, (3, 17)))
    std = ClapTextEncoder(cfg, d_proj=24)
    params = _randomize(std.init(jax.random.PRNGKey(0), ids)["params"])
    y_std = std.apply({"params": params}, ids)

    fused_params = {**params, "bert": fuse_bert_params(params["bert"])}
    fused = ClapTextEncoder(cfg, d_proj=24, fuse_proj=True)
    y_fused = fused.apply({"params": fused_params}, ids)

    # fused layout must init to the same shapes it consumes
    ref_shapes = jax.eval_shape(
        lambda: fused.init(jax.random.PRNGKey(0), ids))["params"]
    assert jax.tree.map(lambda a: a.shape, fused_params) == jax.tree.map(
        lambda s: s.shape, ref_shapes)
    np.testing.assert_allclose(y_std, y_fused, atol=1e-6, rtol=0)


def test_t5_fused_matches_unfused():
    cfg = T5Config(vocab_size=130, d_model=32, d_kv=8, d_ff=48,
                   num_layers=2, num_heads=4)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 130, (3, 13)))
    std = T5Encoder(cfg)
    params = _randomize(std.init(jax.random.PRNGKey(0), ids)["params"])
    y_std = std.apply({"params": params}, ids)

    fused = T5Encoder(cfg, fuse_proj=True)
    fused_params = fuse_t5_params(params)
    y_fused = fused.apply({"params": fused_params}, ids)

    ref_shapes = jax.eval_shape(
        lambda: fused.init(jax.random.PRNGKey(0), ids))["params"]
    assert jax.tree.map(lambda a: a.shape, fused_params) == jax.tree.map(
        lambda s: s.shape, ref_shapes)
    np.testing.assert_allclose(y_std, y_fused, atol=1e-6, rtol=0)
