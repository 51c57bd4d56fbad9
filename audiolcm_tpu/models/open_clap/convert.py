"""torch -> flax converter for LAION open_clap checkpoints.

Key layout is the reference CLAP module tree
(`ldm/modules/encoders/open_clap/model.py:422-549`):
  text_branch.* (HF RobertaModel), text_projection.{0,2}.*,
  audio_projection.{0,2}.*, {text,audio}_transform.sequential.{0,3}.*,
  audio_branch.* (HTSAT htsat.py:599-754 or PANN pann_model.py:146-222),
  logit_scale_a/t.
"""

from __future__ import annotations

import numpy as np

from audiolcm_tpu.convert.torch_to_flax import SD, _dense, _norm, convert_bert
from audiolcm_tpu.models.open_clap.htsat import HTSATConfig
from audiolcm_tpu.models.open_clap.model import OpenClapConfig
from audiolcm_tpu.models.open_clap.pann import PannConfig


def _conv2d(sd: SD, name: str, bias: bool = True) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _conv1d_cl(sd: SD, name: str, bias: bool = True) -> dict:
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if bias:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _bn(sd: SD, name: str) -> tuple:
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def _projection(sd: SD, prefix: str) -> dict:
    return {"linear1": _dense(sd, f"{prefix}.0"),
            "linear2": _dense(sd, f"{prefix}.2")}


def _mlp_layers(sd: SD, prefix: str) -> dict:
    return {"linear_0": _dense(sd, f"{prefix}.sequential.0"),
            "linear_1": _dense(sd, f"{prefix}.sequential.3")}


def convert_roberta(sd: SD, num_layers: int = 12) -> dict:
    """HF RobertaModel state dict -> params for RobertaEncoder (the layer
    stack matches BERT; pooler added)."""
    params = convert_bert(sd, num_layers=num_layers)
    params["pooler"] = _dense(sd, "pooler.dense")
    return params


def convert_bart(sd: SD, num_layers: int = 6) -> dict:
    """HF BartModel ENCODER state dict (keys under `encoder.`) -> params for
    text_towers.BartEncoder (the reference's `bart` text branch,
    `open_clap/model.py:515-524`)."""
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    params = {
        "embed_tokens": {"embedding": enc["embed_tokens.weight"]},
        "embed_positions": enc["embed_positions.weight"],
        "layernorm_embedding": _norm(enc, "layernorm_embedding"),
    }
    for i in range(num_layers):
        p = f"layers.{i}"
        params[f"q_{i}"] = _dense(enc, f"{p}.self_attn.q_proj")
        params[f"k_{i}"] = _dense(enc, f"{p}.self_attn.k_proj")
        params[f"v_{i}"] = _dense(enc, f"{p}.self_attn.v_proj")
        params[f"attn_out_{i}"] = _dense(enc, f"{p}.self_attn.out_proj")
        params[f"self_attn_layer_norm_{i}"] = _norm(enc, f"{p}.self_attn_layer_norm")
        params[f"fc1_{i}"] = _dense(enc, f"{p}.fc1")
        params[f"fc2_{i}"] = _dense(enc, f"{p}.fc2")
        params[f"final_layer_norm_{i}"] = _norm(enc, f"{p}.final_layer_norm")
    return params


def _fusion_params(sd: SD, prefix: str, iaff: bool) -> tuple:
    """AFF/iAFF torch Sequential indices: conv(0) bn(1) relu(2) conv(3)
    bn(4); global branches have AdaptiveAvgPool at 0, shifting by 1.
    iAFF's dead global_att2 weights are dropped (see fusion.iAFF)."""

    def branch(name, pooled):
        off = 1 if pooled else 0
        c1 = _any_conv(sd, f"{prefix}.{name}.{0 + off}")
        b1p, b1s = _bn(sd, f"{prefix}.{name}.{1 + off}")
        c2 = _any_conv(sd, f"{prefix}.{name}.{3 + off}")
        b2p, b2s = _bn(sd, f"{prefix}.{name}.{4 + off}")
        return ({"conv1": c1, "bn1": b1p, "conv2": c2, "bn2": b2p},
                {"bn1": b1s, "bn2": b2s})

    names = ["local_att", "global_att"] + (["local_att2"] if iaff else [])
    params, stats = {}, {}
    for name in names:
        p, s = branch(name, name.startswith("global"))
        params[name] = p
        stats[name] = s
    return params, stats


def _any_conv(sd: SD, name: str) -> dict:
    w = np.asarray(sd[f"{name}.weight"])
    if w.ndim == 4:
        kernel = w.transpose(2, 3, 1, 0)
    else:
        kernel = w.transpose(2, 1, 0)
    return {"kernel": kernel, "bias": np.asarray(sd[f"{name}.bias"])}


def convert_htsat(sd: SD, cfg: HTSATConfig) -> dict:
    """audio_branch.* HTSAT keys -> flax {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}
    params["bn0"], stats["bn0"] = _bn(sd, "bn0")
    params["proj"] = _conv2d(sd, "patch_embed.proj")
    params["patch_norm"] = _norm(sd, "patch_embed.norm")
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            blk = {
                "norm1": _norm(sd, f"{p}.norm1"),
                "norm2": _norm(sd, f"{p}.norm2"),
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
                "attn": {
                    "qkv": _dense(sd, f"{p}.attn.qkv"),
                    "proj": _dense(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                },
            }
            params[f"layer_{i}_block_{j}"] = blk
        if i < len(cfg.depths) - 1:
            params[f"downsample_{i}"] = {
                "norm": _norm(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"kernel": np.asarray(
                    sd[f"layers.{i}.downsample.reduction.weight"]).T},
            }
    params["norm"] = _norm(sd, "norm")
    params["tscam_conv"] = _conv2d(sd, "tscam_conv")
    if cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        params["mel_conv2d"] = _conv2d(sd, "patch_embed.mel_conv2d")
        if cfg.fusion_type != "daf_2d":
            fp, fs = _fusion_params(sd, "patch_embed.fusion_model",
                                    iaff=cfg.fusion_type == "iaff_2d")
            params["fusion_model"] = fp
            stats["fusion_model"] = fs
    if cfg.enable_fusion and cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        params["mel_conv1d"] = _conv1d_cl(sd, "mel_conv1d.0")
        params["mel_conv1d_bn"], stats["mel_conv1d_bn"] = _bn(sd, "mel_conv1d.1")
        if cfg.fusion_type != "daf_1d":
            fp, fs = _fusion_params(sd, "fusion_model",
                                    iaff=cfg.fusion_type == "iaff_1d")
            params["fusion_model"] = fp
            stats["fusion_model"] = fs
    return {"params": params, "batch_stats": stats}


def convert_pann(sd: SD, cfg: PannConfig) -> dict:
    params: dict = {}
    stats: dict = {}
    params["bn0"], stats["bn0"] = _bn(sd, "bn0")
    n_blocks = {"Cnn14": 6, "Cnn10": 5, "Cnn6": 4}[cfg.model_name]
    convs = (1,) if cfg.model_name == "Cnn6" else (1, 2)
    for b in range(1, n_blocks + 1):
        blk, blk_stats = {}, {}
        for c in convs:
            blk[f"conv{c}"] = _conv2d(sd, f"conv_block{b}.conv{c}", bias=False)
            p, s = _bn(sd, f"conv_block{b}.bn{c}")
            blk[f"bn{c}"], blk_stats[f"bn{c}"] = p, s
        params[f"conv_block{b}"] = blk
        stats[f"conv_block{b}"] = blk_stats
    params["fc1"] = _dense(sd, "fc1")
    params["fc_audioset"] = _dense(sd, "fc_audioset")
    if cfg.enable_fusion and cfg.fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        params["mel_conv1d"] = _conv1d_cl(sd, "mel_conv1d.0")
        params["mel_conv1d_bn"], stats["mel_conv1d_bn"] = _bn(sd, "mel_conv1d.1")
    if cfg.enable_fusion and cfg.fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        params["mel_conv2d"] = _conv2d(sd, "mel_conv2d.0")
        params["mel_conv2d_bn"], stats["mel_conv2d_bn"] = _bn(sd, "mel_conv2d.1")
    if cfg.enable_fusion and cfg.fusion_type in ("aff_1d", "iaff_1d",
                                                 "aff_2d", "iaff_2d"):
        fp, fs = _fusion_params(sd, "fusion_model",
                                iaff="iaff" in cfg.fusion_type)
        params["fusion_model"] = fp
        stats["fusion_model"] = fs
    return {"params": params, "batch_stats": stats}


def _strip(sd: SD, prefix: str) -> SD:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_open_clap(sd: SD, cfg: OpenClapConfig) -> dict:
    """Full CLAP state dict -> flax variables for models.open_clap.OpenClap."""
    params: dict = {
        "logit_scale_a": np.asarray(sd["logit_scale_a"]),
        "logit_scale_t": np.asarray(sd["logit_scale_t"]),
        "text_projection": _projection(sd, "text_projection"),
        "audio_projection": _projection(sd, "audio_projection"),
        "text_transform": _mlp_layers(sd, "text_transform"),
        "audio_transform": _mlp_layers(sd, "audio_transform"),
    }
    stats: dict = {}
    text_sd = _strip(sd, "text_branch.")
    n_layers = 1 + max(
        (int(k.split(".")[2]) for k in text_sd if k.startswith("encoder.layer.")),
        default=-1)
    if cfg.text_model_type == "roberta":
        params["text_branch"] = convert_roberta(text_sd, num_layers=n_layers)
    elif cfg.text_model_type == "bert":
        params["text_branch"] = convert_bert(text_sd, num_layers=n_layers)
    elif cfg.text_model_type == "bart":
        n_bart = 1 + max(
            (int(k.split(".")[2]) for k in text_sd
             if k.startswith("encoder.layers.")), default=-1)
        params["text_branch"] = convert_bart(text_sd, num_layers=n_bart)
    audio_sd = _strip(sd, "audio_branch.")
    if audio_sd:
        if isinstance(cfg.audio, HTSATConfig):
            vars_ = convert_htsat(audio_sd, cfg.audio)
        else:
            vars_ = convert_pann(audio_sd, cfg.audio)
        params["audio_branch"] = vars_["params"]
        stats["audio_branch"] = vars_["batch_stats"]
    return {"params": params, "batch_stats": stats}


def convert_modified_resnet(sd: SD) -> dict:
    """`visual.*` ModifiedResNet state dict (`model.py:153-244`) ->
    flax variables for vision_towers.ModifiedResNet."""
    params: dict = {}
    stats: dict = {}
    for name in ("bn1", "bn2", "bn3"):
        params[name], stats[name] = _bn(sd, name)
    for name in ("conv1", "conv2", "conv3"):
        params[name] = _conv2d(sd, name, bias=False)
    blocks = sorted(
        {tuple(k.split(".")[:2]) for k in sd if k.startswith("layer")},
        key=lambda t: (t[0], int(t[1])))
    for stage, idx in blocks:
        base = f"{stage}.{idx}"
        p: dict = {}
        s: dict = {}
        for name in ("bn1", "bn2", "bn3"):
            p[name], s[name] = _bn(sd, f"{base}.{name}")
        for name in ("conv1", "conv2", "conv3"):
            p[name] = _conv2d(sd, f"{base}.{name}", bias=False)
        if f"{base}.downsample.0.weight" in sd:
            p["downsample_conv"] = _conv2d(sd, f"{base}.downsample.0",
                                           bias=False)
            p["downsample_bn"], s["downsample_bn"] = _bn(
                sd, f"{base}.downsample.1")
        key = f"{stage}_{idx}"
        params[key], stats[key] = p, s
    params["attnpool"] = {
        "positional_embedding": np.asarray(sd["attnpool.positional_embedding"]),
        "q_proj": _dense(sd, "attnpool.q_proj"),
        "k_proj": _dense(sd, "attnpool.k_proj"),
        "v_proj": _dense(sd, "attnpool.v_proj"),
        "c_proj": _dense(sd, "attnpool.c_proj"),
    }
    return {"params": params, "batch_stats": stats}


def convert_visual_transformer(sd: SD) -> dict:
    """`visual.*` VisualTransformer state dict (`model.py:305-373`) ->
    flax params for vision_towers.VisualTransformer."""
    params: dict = {
        "class_embedding": np.asarray(sd["class_embedding"]),
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "proj": np.asarray(sd["proj"]),
        "conv1": _conv2d(sd, "conv1", bias=False),
        "ln_pre": _norm(sd, "ln_pre"),
        "ln_post": _norm(sd, "ln_post"),
    }
    n_blocks = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("text_branch.resblocks."))
    for i in range(n_blocks):
        base = f"text_branch.resblocks.{i}"
        params[f"block_{i}"] = {
            "ln_1": _norm(sd, f"{base}.ln_1"),
            "ln_2": _norm(sd, f"{base}.ln_2"),
            "in_proj": {"kernel": np.asarray(sd[f"{base}.attn.in_proj_weight"]).T,
                        "bias": np.asarray(sd[f"{base}.attn.in_proj_bias"])},
            "out_proj": _dense(sd, f"{base}.attn.out_proj"),
            "c_fc": _dense(sd, f"{base}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{base}.mlp.c_proj"),
        }
    return {"params": params}
