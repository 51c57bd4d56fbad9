"""Torch state-dict -> flax param-tree converters for every model family.

Input is a flat {name: numpy array} dict (load .pt/.ckpt files with
audiolcm_tpu.convert.load_torch so torch is only touched at the file edge).
Layout rules:

  torch Linear  (out, in)      -> Dense kernel (in, out)
  torch Conv1d  (out, in, K)   -> nn.Conv kernel (K, in, out)
  torch ConvT1d (in, out, K)   -> ConvTranspose1dTorchParity kernel
                                  (K, in, out) with K axis FLIPPED (lax
                                  correlation == torch transposed-conv
                                  adjoint semantics)
  weight_norm (g, v)           -> folded: w = g * v / ||v||_(per out-chan)
  LayerNorm/GroupNorm weight   -> 'scale'
  Embedding weight             -> 'embedding'

Source layouts documented against the reference modules; see each converter.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Array = np.ndarray
SD = Dict[str, Array]


def fold_weight_norm(sd: SD, prefix: str) -> Array:
    """Fold `weight_g`/`weight_v` into a plain kernel (norm over dims 1..)."""
    g = sd[f"{prefix}.weight_g"]
    v = sd[f"{prefix}.weight_v"]
    norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1))
    norm = norm.reshape((-1,) + (1,) * (v.ndim - 1))
    return g * v / np.maximum(norm, 1e-12)


def _dense(sd: SD, name: str, bias: bool = True) -> dict:
    out = {"kernel": sd[f"{name}.weight"].T}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv1d(sd: SD, name: str, bias: bool = True, weight: Array | None = None) -> dict:
    w = weight if weight is not None else sd[f"{name}.weight"]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv1x1_as_dense(sd: SD, name: str, bias: bool = True) -> dict:
    w = sd[f"{name}.weight"][:, :, 0]  # (out, in)
    out = {"kernel": w.T}
    if bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd: SD, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _strip(sd: SD, prefix: str) -> SD:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# DiT (ConcatDiT2MLP / ConcatDiT) — reference: concatDiT.py:238-304
# ---------------------------------------------------------------------------


def _condition_embedder(sd: SD, name: str) -> dict:
    return {
        "mlp_0": _dense(sd, f"{name}.mlp.0"),
        "mlp_2": _dense(sd, f"{name}.mlp.2"),
        "mlp_3": _norm(sd, f"{name}.mlp.3"),
    }


def _attention(sd: SD, name: str) -> dict:
    return {
        "to_q": _dense(sd, f"{name}.to_q", bias=False),
        "to_k": _dense(sd, f"{name}.to_k", bias=False),
        "to_v": _dense(sd, f"{name}.to_v", bias=False),
        "to_out": _dense(sd, f"{name}.to_out.0"),
    }


def _basic_block(sd: SD, name: str) -> dict:
    return {
        "attn1": _attention(sd, f"{name}.attn1"),
        "attn2": _attention(sd, f"{name}.attn2"),
        "norm1": _norm(sd, f"{name}.norm1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "norm3": _norm(sd, f"{name}.norm3"),
        "ff": {
            "proj": _conv1d(sd, f"{name}.ff.net.0.proj"),
            "out": _conv1d(sd, f"{name}.ff.net.2"),
        },
    }


def convert_dit(sd: SD, depth: int = 4, dual_cond: bool = True) -> dict:
    """ConcatDiT2MLP state dict -> flax params for models.dit.ConcatDiT2MLP."""
    params: dict = {
        "t_embedder": {
            "mlp_0": _dense(sd, "t_embedder.mlp.0"),
            "mlp_2": _dense(sd, "t_embedder.mlp.2"),
            "proj_w": _dense(sd, "t_embedder.proj_w", bias=False),
        },
        "proj_in": _conv1d(sd, "proj_in"),
        "pos_emb": sd["pos_emb.weight"],
        "final_norm": _norm(sd, "final_layer.norm_final"),
        "final_conv": _conv1x1_as_dense(sd, "final_layer.conv1d"),
    }
    if dual_cond:
        params["c1_embedder"] = _condition_embedder(sd, "c1_embedder")
        params["c2_embedder"] = _condition_embedder(sd, "c2_embedder")
    else:
        params["c_embedder"] = _condition_embedder(sd, "c_embedder")
    for i in range(depth):
        params[f"blocks_{i}"] = {
            "norm": _norm(sd, f"blocks.{i}.norm"),
            "proj_in": _conv1x1_as_dense(sd, f"blocks.{i}.proj_in"),
            "proj_out": _conv1x1_as_dense(sd, f"blocks.{i}.proj_out"),
            "block_0": _basic_block(sd, f"blocks.{i}.transformer_blocks.0"),
        }
    return params


# ---------------------------------------------------------------------------
# VAE — reference: autoencoder1d.py
# ---------------------------------------------------------------------------


def _resblock(sd: SD, name: str) -> dict:
    out = {
        "norm1": _norm(sd, f"{name}.norm1"),
        "conv1": _conv1d(sd, f"{name}.conv1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "conv2": _conv1d(sd, f"{name}.conv2"),
    }
    if f"{name}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv1d(sd, f"{name}.nin_shortcut")
    return out


def _attnblock(sd: SD, name: str) -> dict:
    return {
        "norm": _norm(sd, f"{name}.norm"),
        "q": _conv1d(sd, f"{name}.q"),
        "k": _conv1d(sd, f"{name}.k"),
        "v": _conv1d(sd, f"{name}.v"),
        "proj_out": _conv1d(sd, f"{name}.proj_out"),
    }


def convert_vae(
    sd: SD,
    num_levels: int = 3,
    num_res_blocks: int = 2,
    down_layers=(0,),
    attn_layers=(),
) -> dict:
    """AutoencoderKL (1D) state dict -> params for models.vae1d.AutoencoderKL1D."""
    enc: dict = {
        "conv_in": _conv1d(sd, "encoder.conv_in"),
        "mid_block_1": _resblock(sd, "encoder.mid.block_1"),
        "mid_attn_1": _attnblock(sd, "encoder.mid.attn_1"),
        "mid_block_2": _resblock(sd, "encoder.mid.block_2"),
        "norm_out": _norm(sd, "encoder.norm_out"),
        "conv_out": _conv1d(sd, "encoder.conv_out"),
    }
    for i in range(num_levels):
        for j in range(num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _resblock(sd, f"encoder.down.{i}.block.{j}")
            if i in attn_layers:
                enc[f"down_{i}_attn_{j}"] = _attnblock(sd, f"encoder.down.{i}.attn.{j}")
        if i in down_layers:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv1d(sd, f"encoder.down.{i}.downsample.conv")
            }
    dec: dict = {
        "conv_in": _conv1d(sd, "decoder.conv_in"),
        "mid_block_1": _resblock(sd, "decoder.mid.block_1"),
        "mid_attn_1": _attnblock(sd, "decoder.mid.attn_1"),
        "mid_block_2": _resblock(sd, "decoder.mid.block_2"),
        "norm_out": _norm(sd, "decoder.norm_out"),
        "conv_out": _conv1d(sd, "decoder.conv_out"),
    }
    up_layers = [i + 1 for i in down_layers]
    for i in range(num_levels):
        for j in range(num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _resblock(sd, f"decoder.up.{i}.block.{j}")
            if i in attn_layers:
                dec[f"up_{i}_attn_{j}"] = _attnblock(sd, f"decoder.up.{i}.attn.{j}")
        if i in up_layers:
            dec[f"up_{i}_upsample"] = {"conv": _conv1d(sd, f"decoder.up.{i}.upsample.conv")}
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv1d(sd, "quant_conv"),
        "post_quant_conv": _conv1d(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# BigVGAN — reference: vocoder/bigvgan/models.py (weight_norm folded)
# ---------------------------------------------------------------------------


def _wn_conv1d(sd: SD, name: str) -> dict:
    return _conv1d(sd, name, weight=fold_weight_norm(sd, name))


def _wn_convtranspose1d(sd: SD, name: str) -> dict:
    w = fold_weight_norm(sd, name)  # (in, out, K)
    return {
        "kernel": np.transpose(w[:, :, ::-1], (2, 0, 1)).copy(),
        "bias": sd[f"{name}.bias"],
    }


def convert_bigvgan(
    sd: SD,
    num_upsamples: int = 6,
    num_kernels: int = 3,
    dilations_per_block: int = 3,
    resblock: str = "1",
) -> dict:
    """BigVGAN generator state dict -> params for models.bigvgan.BigVGAN."""
    params: dict = {
        "conv_pre": _wn_conv1d(sd, "conv_pre"),
        "conv_post": _wn_conv1d(sd, "conv_post"),
        "act_post": {
            "alpha": sd["activation_post.act.alpha"],
            "beta": sd["activation_post.act.beta"],
        },
    }
    for i in range(num_upsamples):
        params[f"ups_{i}"] = _wn_convtranspose1d(sd, f"ups.{i}.0")
        for j in range(num_kernels):
            r = f"resblocks.{i * num_kernels + j}"
            block: dict = {}
            for m in range(dilations_per_block):
                if resblock == "1":
                    block[f"conv1_{m}"] = _wn_conv1d(sd, f"{r}.convs1.{m}")
                    block[f"conv2_{m}"] = _wn_conv1d(sd, f"{r}.convs2.{m}")
                    block[f"act1_{m}"] = {
                        "alpha": sd[f"{r}.activations.{2 * m}.act.alpha"],
                        "beta": sd[f"{r}.activations.{2 * m}.act.beta"],
                    }
                    block[f"act2_{m}"] = {
                        "alpha": sd[f"{r}.activations.{2 * m + 1}.act.alpha"],
                        "beta": sd[f"{r}.activations.{2 * m + 1}.act.beta"],
                    }
                else:
                    block[f"conv_{m}"] = _wn_conv1d(sd, f"{r}.convs.{m}")
                    block[f"act_{m}"] = {
                        "alpha": sd[f"{r}.activations.{m}.act.alpha"],
                        "beta": sd[f"{r}.activations.{m}.act.beta"],
                    }
            params[f"resblock_{i}_{j}"] = block
    return params


# ---------------------------------------------------------------------------
# CLAP text tower (HF BertModel layout) — reference: CLAP/clap.py:42-52
# ---------------------------------------------------------------------------


def convert_bert(sd: SD, num_layers: int = 12) -> dict:
    """HF BertModel state dict -> params for models.clap_text.BertEncoder."""
    params: dict = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "emb_norm": _norm(sd, "embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": _dense(sd, f"{p}.attention.self.query"),
            "k": _dense(sd, f"{p}.attention.self.key"),
            "v": _dense(sd, f"{p}.attention.self.value"),
            "attn_out": _dense(sd, f"{p}.attention.output.dense"),
            "attn_norm": _norm(sd, f"{p}.attention.output.LayerNorm"),
            "ff_in": _dense(sd, f"{p}.intermediate.dense"),
            "ff_out": _dense(sd, f"{p}.output.dense"),
            "ff_norm": _norm(sd, f"{p}.output.LayerNorm"),
        }
    return params


def convert_clap_text_encoder(sd: SD, num_layers: int = 12) -> dict:
    """caption_encoder.* (TextEncoder) -> params for ClapTextEncoder.

    Expects keys already stripped of the 'caption_encoder.' prefix, i.e.
    'base.embeddings...', 'projection.linear1.weight', ...
    """
    return {
        "bert": convert_bert(_strip(sd, "base."), num_layers),
        "projection": {
            "linear1": _dense(sd, "projection.linear1", bias=False),
            "linear2": _dense(sd, "projection.linear2", bias=False),
            "layer_norm": _norm(sd, "projection.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# T5 encoder (HF T5EncoderModel layout)
# ---------------------------------------------------------------------------


def convert_t5_encoder(sd: SD, num_layers: int = 24) -> dict:
    """HF T5EncoderModel state dict -> params for models.t5_encoder.T5Encoder."""
    embed_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    params: dict = {
        "token_embedder": {"embedding": sd[embed_key]},
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "final_norm": {"weight": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}"
        params[f"layer_{i}"] = {
            "q": _dense(sd, f"{p}.layer.0.SelfAttention.q", bias=False),
            "k": _dense(sd, f"{p}.layer.0.SelfAttention.k", bias=False),
            "v": _dense(sd, f"{p}.layer.0.SelfAttention.v", bias=False),
            "o": _dense(sd, f"{p}.layer.0.SelfAttention.o", bias=False),
            "attn_norm": {"weight": sd[f"{p}.layer.0.layer_norm.weight"]},
            "wi_0": _dense(sd, f"{p}.layer.1.DenseReluDense.wi_0", bias=False),
            "wi_1": _dense(sd, f"{p}.layer.1.DenseReluDense.wi_1", bias=False),
            "wo": _dense(sd, f"{p}.layer.1.DenseReluDense.wo", bias=False),
            "ff_norm": {"weight": sd[f"{p}.layer.1.layer_norm.weight"]},
        }
    return params
