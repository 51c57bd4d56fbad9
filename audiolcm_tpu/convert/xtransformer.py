"""torch→flax parameter conversion for the x_transformer zoo.

Maps the vendored lucidrains module's state_dict (`ldm/modules/x_transformer.py`,
`TransformerWrapper` over `Encoder`) onto
`audiolcm_tpu.models.x_transformer_zoo.XTransformerWrapper` parameter trees,
across the full option zoo (norm variants, rezero, macaron Scale wrappers,
GRU-gated residuals, talking heads, memory kv, on_attn GLU heads, GEGLU FF).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from audiolcm_tpu.convert.torch_to_flax import _dense, _norm
from audiolcm_tpu.models.x_transformer_zoo import XTransformerEncoder

SD = Dict[str, Any]


def _attention(sd: SD, prefix: str, on_attn: bool, talking_heads: bool,
               num_mem_kv: int) -> dict:
    out = {
        "to_q": _dense(sd, f"{prefix}.to_q", bias=False),
        "to_k": _dense(sd, f"{prefix}.to_k", bias=False),
        "to_v": _dense(sd, f"{prefix}.to_v", bias=False),
    }
    if on_attn:
        # nn.Sequential(Linear, GLU) → Linear is index 0
        out["to_out"] = _dense(sd, f"{prefix}.to_out.0")
    else:
        out["to_out"] = _dense(sd, f"{prefix}.to_out")
    if talking_heads:
        out["pre_softmax_proj"] = sd[f"{prefix}.pre_softmax_proj"]
        out["post_softmax_proj"] = sd[f"{prefix}.post_softmax_proj"]
    if num_mem_kv > 0:
        out["mem_k"] = sd[f"{prefix}.mem_k"]
        out["mem_v"] = sd[f"{prefix}.mem_v"]
    return out


def _feedforward(sd: SD, prefix: str, glu: bool) -> dict:
    # nn.Sequential(project_in, Dropout, Linear); project_in is
    # Sequential(Linear, GELU) (index .0.0) or GEGLU (.0.proj)
    proj_in = f"{prefix}.net.0.proj" if glu else f"{prefix}.net.0.0"
    return {
        "proj_in": _dense(sd, proj_in),
        "proj_out": _dense(sd, f"{prefix}.net.2"),
    }


def convert_encoder(sd: SD, enc: XTransformerEncoder, prefix: str = "") -> dict:
    """state_dict of `AttentionLayers` → XTransformerEncoder params."""
    types = enc.layer_types
    params: dict = {}
    for i, t in enumerate(types):
        base = f"{prefix}layers.{i}"
        # norm slot (index 0): Identity under rezero, else the norm module
        if not enc.use_rezero:
            if enc.use_rmsnorm or enc.use_scalenorm:
                params[f"norm_{i}"] = {"g": sd[f"{base}.0.g"]}
            else:
                params[f"norm_{i}"] = _norm(sd, f"{base}.0")
        # block slot (index 1); attention may be Rezero-wrapped (.1.fn),
        # macaron FF is Scale-wrapped (.1.fn); Scale itself has no params
        if t in ("a", "c"):
            inner = f"{base}.1.fn" if enc.use_rezero else f"{base}.1"
            params[f"attn_{i}"] = _attention(
                sd, inner, enc.on_attn, enc.talking_heads, enc.num_mem_kv)
            if enc.use_rezero:
                params[f"rezero_g_{i}"] = sd[f"{base}.1.g"]
        else:
            inner = f"{base}.1.fn" if enc.macaron else f"{base}.1"
            params[f"ff_{i}"] = _feedforward(sd, inner, enc.ff_glu)
        # residual slot (index 2)
        if enc.gate_residual:
            params[f"gate_{i}"] = {
                "weight_ih": sd[f"{base}.2.gru.weight_ih"],
                "weight_hh": sd[f"{base}.2.gru.weight_hh"],
                "bias_ih": sd[f"{base}.2.gru.bias_ih"],
                "bias_hh": sd[f"{base}.2.gru.bias_hh"],
            }
    return params


def convert_wrapper(sd: SD, enc: XTransformerEncoder, *, emb_dim_differs: bool,
                    num_memory_tokens: int = 0, tie_embedding: bool = False,
                    return_embeddings: bool = True) -> dict:
    """state_dict of `TransformerWrapper` → XTransformerWrapper params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {"token_emb": sd["token_emb.weight"],
                    "final_norm": _norm(sd, "norm")}
    if "pos_emb.emb.weight" in sd:
        params["pos_emb"] = sd["pos_emb.emb.weight"]
    if emb_dim_differs:
        params["project_emb"] = _dense(sd, "project_emb")
    if num_memory_tokens > 0:
        params["memory_tokens"] = sd["memory_tokens"]
    if not return_embeddings and not tie_embedding:
        params["to_logits"] = _dense(sd, "to_logits")
    params["encoder"] = convert_encoder(sd, enc, prefix="attn_layers.")
    return params
