"""Numerics parity: our flax BERT/T5 towers vs HF torch reference models.

The reference loads HF `BertModel` (inside CLAP) and `T5EncoderModel`
(`ldm/modules/encoders/modules.py:529-582`), so HF torch IS the behavior
spec. We instantiate tiny random-init HF models, convert their state dicts,
and require the flax forward to match within f32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert import convert_bert, convert_t5_encoder
from audiolcm_tpu.models.clap_text import BertConfig, BertEncoder, ClapTextEncoder, Projection
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder


def _np_sd(torch_model):
    return {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}


def test_bert_matches_hf(rng):
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()

    ids = rng.integers(0, 100, size=(2, 16))
    with torch.no_grad():
        golden = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64,
    )
    params = {"params": convert_bert(_np_sd(hf), num_layers=2)}
    ours = np.asarray(BertEncoder(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_t5_encoder_matches_hf(rng):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=3,
        num_heads=4,
        feed_forward_proj="gated-gelu",  # t5-v1.1 family
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = rng.integers(0, 120, size=(2, 12))
    with torch.no_grad():
        golden = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    cfg = T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=3, num_heads=4)
    params = {"params": convert_t5_encoder(_np_sd(hf), num_layers=3)}
    ours = np.asarray(T5Encoder(cfg).apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, golden, atol=3e-5)


def test_clap_projection_matches_torch(rng):
    """Projection (CLAP/clap.py:8-20): LN(l1(x) + l2(gelu(l1(x))))."""
    import torch

    d_in, d_out = 16, 24
    x = rng.standard_normal((2, 5, d_in)).astype(np.float32)
    w1 = rng.standard_normal((d_out, d_in)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((d_out, d_out)).astype(np.float32) * 0.1
    gamma = rng.standard_normal(d_out).astype(np.float32)
    beta = rng.standard_normal(d_out).astype(np.float32)

    xt = torch.from_numpy(x)
    e1 = xt @ torch.from_numpy(w1).T
    e2 = torch.nn.functional.gelu(e1) @ torch.from_numpy(w2).T
    golden = torch.nn.functional.layer_norm(
        e1 + e2, (d_out,), torch.from_numpy(gamma), torch.from_numpy(beta)
    ).numpy()

    params = {
        "params": {
            "linear1": {"kernel": w1.T},
            "linear2": {"kernel": w2.T},
            "layer_norm": {"scale": gamma, "bias": beta},
        }
    }
    ours = np.asarray(Projection(d_out).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_clap_text_encoder_shapes():
    cfg = BertConfig(
        vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=96,
    )
    model = ClapTextEncoder(cfg, d_proj=24)
    ids = jnp.zeros((2, 77), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 77, 24)


def test_trainable_text_transformer():
    """BERTEmbedder-slot encoder: trainable from scratch, grads flow."""
    from audiolcm_tpu.models.text_transformer import TransformerTextEncoder

    model = TransformerTextEncoder(vocab_size=50, max_seq_len=16, dim=32,
                                   depth=2, num_heads=4)
    ids = jnp.zeros((2, 10), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 10, 32)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, ids) ** 2))(params)
    assert np.abs(np.asarray(jax.tree.leaves(g)[0])).sum() >= 0  # finite grads
