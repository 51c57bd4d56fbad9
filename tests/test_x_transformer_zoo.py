"""Golden tests: x_transformer zoo flax port vs the reference's OWN module.

Each case builds the reference `TransformerWrapper`/`Encoder`
(`ldm/modules/x_transformer.py`) with a distinct option set, converts its
random-initialized state_dict through `convert.xtransformer`, and asserts the
flax forward matches the torch forward.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiolcm_tpu.convert.xtransformer import convert_wrapper
from audiolcm_tpu.models.x_transformer_zoo import (
    XTransformerEncoder,
    XTransformerWrapper,
    compute_layer_types,
)
from tests.ref_loader import load_reference

REF = load_reference().x_transformer

DIM, DEPTH, HEADS, DIM_HEAD = 64, 2, 4, 16
VOCAB, MAXLEN, B, N = 50, 12, 2, 9


def _build_pair(enc_kwargs=None, wrap_kwargs=None, ref_enc_kwargs=None,
                ref_wrap_kwargs=None):
    torch.manual_seed(0)
    ref_enc = REF.Encoder(dim=DIM, depth=DEPTH, heads=HEADS,
                          attn_dim_head=DIM_HEAD, **(ref_enc_kwargs or {}))
    ref = REF.TransformerWrapper(
        num_tokens=VOCAB, max_seq_len=MAXLEN, attn_layers=ref_enc,
        **(ref_wrap_kwargs or {}))
    ref.eval()

    enc = XTransformerEncoder(dim=DIM, depth=DEPTH, heads=HEADS,
                              dim_head=DIM_HEAD, **(enc_kwargs or {}))
    wk = dict(wrap_kwargs or {})
    wrap = XTransformerWrapper(num_tokens=VOCAB, max_seq_len=MAXLEN,
                               encoder=enc, **wk)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_wrapper(
        sd, enc,
        emb_dim_differs="emb_dim" in wk and wk["emb_dim"] not in (None, DIM),
        num_memory_tokens=wk.get("num_memory_tokens", 0) or 0,
        tie_embedding=wk.get("tie_embedding", False),
        return_embeddings=wk.get("return_embeddings", True),
    )
    return ref, wrap, {"params": params}


def _check(ref, wrap, params, mask=None, ref_kwargs=None, atol=2e-5):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, size=(B, N))
    tids = torch.from_numpy(ids)
    with torch.no_grad():
        golden = ref(tids, return_embeddings=wrap.return_embeddings,
                     mask=None if mask is None else torch.from_numpy(mask),
                     **(ref_kwargs or {}))
    ours = wrap.apply(params, jnp.asarray(ids),
                      mask=None if mask is None else jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(),
                               atol=atol, rtol=1e-4)


def test_vanilla_encoder_matches_reference():
    ref, wrap, params = _build_pair()
    _check(ref, wrap, params)


def test_padding_mask_matches_reference():
    ref, wrap, params = _build_pair()
    mask = np.ones((B, N), dtype=bool)
    mask[0, 5:] = False
    mask[1, 7:] = False
    _check(ref, wrap, params, mask=mask)


@pytest.mark.parametrize("flag", ["use_scalenorm", "use_rmsnorm", "use_rezero"])
def test_norm_variants_match_reference(flag):
    ref, wrap, params = _build_pair(enc_kwargs={flag: True},
                                    ref_enc_kwargs={flag: True})
    _check(ref, wrap, params)


def test_macaron_layout_and_reference_crash():
    """macaron is BROKEN in the reference itself: `Scale.forward` does
    `x, *rest = self.fn(x, **kwargs)` (x_transformer.py:117-125), which
    unpacks the FeedForward's plain Tensor along dim 0, then returns a tuple
    that the residual add rejects. We port the layout + the intended 0.5
    scaling and assert the reference's own forward raises."""
    ref, wrap, params = _build_pair(enc_kwargs={"macaron": True},
                                    ref_enc_kwargs={"macaron": True})
    assert wrap.encoder.layer_types == ("f", "a", "f") * DEPTH
    assert tuple(ref.attn_layers.layer_types) == wrap.encoder.layer_types
    ids = np.random.default_rng(1).integers(0, VOCAB, size=(B, N))
    with pytest.raises(TypeError):
        with torch.no_grad():
            ref(torch.from_numpy(ids), return_embeddings=True)
    out = wrap.apply(params, jnp.asarray(ids))
    assert np.isfinite(np.asarray(out)).all() and out.shape == (B, N, DIM)


def test_sandwich_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"sandwich_coef": 1},
                                    ref_enc_kwargs={"sandwich_coef": 1})
    _check(ref, wrap, params)


def test_post_norm_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"pre_norm": False},
                                    ref_enc_kwargs={"pre_norm": False})
    _check(ref, wrap, params)


def test_gru_gated_residual_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"gate_residual": True},
                                    ref_enc_kwargs={"gate_residual": True})
    _check(ref, wrap, params)


def test_residual_attn_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"residual_attn": True},
                                    ref_enc_kwargs={"residual_attn": True})
    _check(ref, wrap, params)


def test_position_infused_attn_matches_reference():
    ref, wrap, params = _build_pair(
        enc_kwargs={"position_infused_attn": True},
        ref_enc_kwargs={"position_infused_attn": True})
    _check(ref, wrap, params)


def test_talking_heads_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"talking_heads": True},
                                    ref_enc_kwargs={"attn_talking_heads": True})
    _check(ref, wrap, params)


def test_sparse_topk_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"sparse_topk": 4},
                                    ref_enc_kwargs={"attn_sparse_topk": 4})
    _check(ref, wrap, params)


def test_mem_kv_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"num_mem_kv": 3},
                                    ref_enc_kwargs={"attn_num_mem_kv": 3})
    _check(ref, wrap, params)


def test_on_attn_glu_head_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"on_attn": True},
                                    ref_enc_kwargs={"attn_on_attn": True})
    _check(ref, wrap, params)


def test_geglu_ff_matches_reference():
    ref, wrap, params = _build_pair(enc_kwargs={"ff_glu": True},
                                    ref_enc_kwargs={"ff_glu": True})
    _check(ref, wrap, params)


def test_memory_tokens_match_reference():
    ref, wrap, params = _build_pair(
        wrap_kwargs={"num_memory_tokens": 2},
        ref_wrap_kwargs={"num_memory_tokens": 2})
    mask = np.ones((B, N), dtype=bool)
    mask[0, 4:] = False
    _check(ref, wrap, params, mask=mask)


def test_emb_dim_projection_matches_reference():
    ref, wrap, params = _build_pair(wrap_kwargs={"emb_dim": 48},
                                    ref_wrap_kwargs={"emb_dim": 48})
    _check(ref, wrap, params)


def test_logits_head_matches_reference():
    ref, wrap, params = _build_pair(wrap_kwargs={"return_embeddings": False},
                                    ref_wrap_kwargs={})
    _check(ref, wrap, params)


def test_tied_logits_match_reference():
    ref, wrap, params = _build_pair(
        wrap_kwargs={"return_embeddings": False, "tie_embedding": True,
                     "use_pos_emb": True},
        ref_wrap_kwargs={"tie_embedding": True})
    _check(ref, wrap, params)


def test_par_and_custom_layer_layouts_match_reference():
    """Layout logic only (PAR paper layering + custom_layers)."""
    for kwargs in (dict(par_ratio=4), dict(custom_layers=("a", "f", "f"))):
        torch.manual_seed(0)
        ref_enc = REF.Encoder(dim=DIM, depth=4, heads=HEADS,
                              attn_dim_head=DIM_HEAD, **kwargs)
        ours = compute_layer_types(4, **{k: tuple(v) if isinstance(v, tuple)
                                         else v for k, v in kwargs.items()})
        assert tuple(ref_enc.layer_types) == ours


def test_combined_zoo_options_match_reference():
    """A kitchen-sink config: rmsnorm + geglu + talking heads + mem-kv +
    gated residuals (macaron excluded — broken in the reference, see above)."""
    enc_kwargs = {"use_rmsnorm": True, "ff_glu": True, "talking_heads": True,
                  "num_mem_kv": 2, "gate_residual": True}
    ref_enc_kwargs = {"use_rmsnorm": True, "ff_glu": True,
                      "attn_talking_heads": True, "attn_num_mem_kv": 2,
                      "gate_residual": True}
    ref, wrap, params = _build_pair(enc_kwargs=enc_kwargs,
                                    ref_enc_kwargs=ref_enc_kwargs)
    _check(ref, wrap, params)
