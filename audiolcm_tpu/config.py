"""Config system: reference YAML schema -> explicit registry -> our models.

The reference instantiates its object graph by reflection
(`instantiate_from_config`, ldm/util.py:111-126) from YAML `target`/`params`
trees. Those YAMLs are the de-facto public API of the training system, so we
keep the exact schema (configs/audiolcm.yaml, teacher.yaml,
autoencoder1d.yaml parse unchanged) but replace reflection with an explicit
registry mapping the reference target strings to TPU-native builders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import yaml

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.clap_text import BertConfig, ClapTextEncoder
from audiolcm_tpu.models.dit import ConcatDiT, ConcatDiT2MLP
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _build_dit(params: dict, cls=ConcatDiT2MLP):
    kw = {}
    if cls is ConcatDiT2MLP and params.get("out_channels"):
        kw["out_channels"] = params["out_channels"]
    return cls(
        in_channels=params["in_channels"],
        context_dim=params["context_dim"],
        hidden_size=params.get("hidden_size", 576),
        depth=params.get("depth", 4),
        num_heads=params.get("num_heads", 8),
        max_len=params.get("max_len", 1000),
        **kw,
    )


def _build_vae(params: dict):
    dd = params["ddconfig"]
    cfg = VAEConfig(
        in_channels=dd["in_channels"],
        out_ch=dd["out_ch"],
        ch=dd["ch"],
        ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"],
        attn_layers=tuple(dd.get("attn_layers", ())),
        down_layers=tuple(dd.get("down_layers", ())),
        kernel_size=dd.get("kernel_size", 3),
        z_channels=dd["z_channels"],
        embed_dim=params["embed_dim"],
        double_z=dd.get("double_z", True),
        dropout=dd.get("dropout", 0.0),
    )
    return AutoencoderKL1D(cfg)


def _build_clapflan(params: dict):
    """FrozenCLAPFLANEmbedder -> (CLAP-BERT tower, T5 tower).

    `bert_config`/`t5_config`/`d_proj` are our extensions (absent from the
    reference schema, which only carries weights_path); they allow scaled-down
    towers for tests and research configs.
    """
    bert_cfg = BertConfig(**(params.get("bert_config") or {}))
    t5_cfg = T5Config(**(params.get("t5_config") or {}))
    return {
        "clap_text": ClapTextEncoder(bert_cfg, d_proj=params.get("d_proj", 1024)),
        "t5": T5Encoder(t5_cfg),
        "max_length": params.get("max_length", 77),
    }


def _build_t5_only(params: dict):
    """FrozenT5Embedder / FrozenFLANEmbedder parity-extras
    (`encoders/modules.py:143,172`): single T5 tower, no CLAP half."""
    return {
        "clap_text": None,
        "t5": T5Encoder(T5Config(**(params.get("t5_config") or {}))),
        "max_length": params.get("max_length", 77),
        "single_tower": True,
    }


def _build_clap_only(params: dict):
    """FrozenCLAPEmbedder parity-extra (`encoders/modules.py:201`)."""
    bert_cfg = BertConfig(**(params.get("bert_config") or {}))
    return {
        "clap_text": ClapTextEncoder(bert_cfg, d_proj=params.get("d_proj", 1024)),
        "t5": None,
        "max_length": params.get("max_length", 77),
        "single_tower": True,
    }


def _build_laion_clap(params: dict, sentence_cls: bool = False):
    """FrozenLAIONCLAPEmbedder(+Setence) (`encoders/modules.py:242,291`):
    HTSAT-tiny/roberta LAION CLAP, text branch only."""
    from audiolcm_tpu.models.open_clap.embedders import (
        FrozenLAIONCLAPEmbedder,
        FrozenLAIONCLAPSetenceEmbedder,
    )

    kw = dict(weights_path=params.get("weights_path", ""),
              tokenizer_path=params.get("tokenizer_path", "roberta-base"))
    if sentence_cls:
        return FrozenLAIONCLAPSetenceEmbedder(**kw)
    return FrozenLAIONCLAPEmbedder(
        sentence=bool(params.get("sentence", False)),
        max_length=params.get("max_length", 77), **kw)


def _build_order_dit(params: dict, cls=None):
    from audiolcm_tpu.models.order_dit import ConcatOrderDiT, ConcatOrderDiT2

    cls = cls or ConcatOrderDiT
    return cls(
        in_channels=params["in_channels"],
        context_dim=params["context_dim"],
        hidden_size=params.get("hidden_size", 576),
        depth=params.get("depth", 4),
        num_heads=params.get("num_heads", 8),
        max_len=params.get("max_len", 1000),
    )


def _build_flag_dit(params: dict):
    from audiolcm_tpu.models.flag_dit import TxtFlagLargeDiT

    return TxtFlagLargeDiT(
        in_channels=params["in_channels"],
        context_dim=params["context_dim"],
        hidden_size=params.get("hidden_size", 576),
        depth=params.get("depth", 4),
        num_heads=params.get("num_heads", 8),
        max_len=params.get("max_len", 1000),
        n_kv_heads=params.get("n_kv_heads"),
        multiple_of=params.get("multiple_of", 256),
        qk_norm=bool(params.get("qk_norm") or False),
    )


def _build_vae2d(params: dict):
    from audiolcm_tpu.models.vae2d import AutoencoderKL2D, VAE2DConfig

    dd = params["ddconfig"]
    return AutoencoderKL2D(VAE2DConfig(
        in_channels=dd["in_channels"], out_ch=dd["out_ch"], ch=dd["ch"],
        ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        resolution=dd.get("resolution", 80), z_channels=dd["z_channels"],
        embed_dim=params["embed_dim"], double_z=dd.get("double_z", True),
        dropout=dd.get("dropout", 0.0),
    ))


MODEL_REGISTRY: Dict[str, Callable[[dict], Any]] = {
    "ldm.modules.diffusionmodules.concatDiT.ConcatDiT2MLP": _build_dit,
    "ldm.modules.diffusionmodules.concatDiT.ConcatDiT": lambda p: _build_dit(p, ConcatDiT),
    "ldm.modules.diffusionmodules.concatDiT.ConcatOrderDiT": _build_order_dit,
    "ldm.modules.diffusionmodules.concatDiT.ConcatOrderDiT2": (
        lambda p: _build_order_dit(p, __import__(
            "audiolcm_tpu.models.order_dit", fromlist=["ConcatOrderDiT2"]
        ).ConcatOrderDiT2)
    ),
    "ldm.modules.diffusionmodules.flag_large_dit.TxtFlagLargeDiT": _build_flag_dit,
    "ldm.models.autoencoder1d.AutoencoderKL": _build_vae,
    "ldm.models.autoencoder.AutoencoderKL": _build_vae2d,
    "ldm.modules.encoders.modules.FrozenCLAPFLANEmbedder": _build_clapflan,
    "ldm.modules.encoders.modules.FrozenT5Embedder": _build_t5_only,
    "ldm.modules.encoders.modules.FrozenFLANEmbedder": _build_t5_only,
    "ldm.modules.encoders.modules.FrozenCLAPEmbedder": _build_clap_only,
    "ldm.modules.encoders.modules.FrozenLAIONCLAPEmbedder": _build_laion_clap,
    "ldm.modules.encoders.modules.FrozenLAIONCLAPSetenceEmbedder": (
        lambda p: _build_laion_clap(p, sentence_cls=True)
    ),
}


def build_from_target(node: dict):
    target = node["target"]
    if target not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown config target {target!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[target](node.get("params") or {})


@dataclasses.dataclass
class DiffusionSystemConfig:
    """Parsed `model.params` of an LCM_audio / LatentDiffusion_audio YAML."""

    unet: Any
    vae: Any
    cond: dict
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    mel_dim: int = 20
    mel_length: int = 312
    num_ddim_timesteps: int = 50
    w_min: float = 4.0
    w_max: float = 12.0
    use_lcm: bool = True
    scale_by_std: bool = True
    scale_factor: float = 1.0
    parameterization: str = "eps"
    base_learning_rate: float = 3.0e-6
    cond_stage_trainable: bool = False
    raw: Optional[dict] = None


def parse_diffusion_config(cfg: dict) -> DiffusionSystemConfig:
    """cfg = full YAML dict (configs/audiolcm.yaml or teacher.yaml schema)."""
    model = cfg["model"]
    p = model["params"]
    return DiffusionSystemConfig(
        unet=build_from_target(p["unet_config"]),
        vae=build_from_target(p["first_stage_config"]),
        cond=build_from_target(p["cond_stage_config"]),
        timesteps=p.get("timesteps", 1000),
        linear_start=p.get("linear_start", 0.00085),
        linear_end=p.get("linear_end", 0.012),
        mel_dim=p.get("mel_dim", 20),
        mel_length=p.get("mel_length", 312),
        num_ddim_timesteps=p.get("num_ddim_timesteps", 50),
        w_min=p.get("w_min", 4.0),
        w_max=p.get("w_max", 12.0),
        use_lcm=p.get("use_lcm", True),
        scale_by_std=p.get("scale_by_std", False),
        scale_factor=p.get("scale_factor", 1.0),
        parameterization=p.get("parameterization", "eps"),
        base_learning_rate=model.get("base_learning_rate", 3.0e-6),
        cond_stage_trainable=p.get("cond_stage_trainable", False),
        raw=cfg,
    )


def build_vocoder_from_args(args: dict) -> BigVGAN:
    """BigVGAN from the vocoder args.yml/json dict
    (`bigvgan_audioset16khz_80band.json` schema)."""
    cfg = BigVGANConfig(
        num_mels=args.get("num_mels", 80),
        upsample_rates=tuple(args["upsample_rates"]),
        upsample_kernel_sizes=tuple(args["upsample_kernel_sizes"]),
        upsample_initial_channel=args["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(args["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in args["resblock_dilation_sizes"]),
        activation=args.get("activation", "snakebeta"),
        snake_logscale=bool(args.get("snake_logscale", True)),
        resblock=str(args.get("resblock", "1")),
    )
    return BigVGAN(cfg)
