"""open_clap model factory: named configs -> OpenClap module (+ optional
torch-checkpoint conversion).

Behavior parity: `ldm/modules/encoders/open_clap/factory.py:68-257`
(`create_model(amodel_name, tmodel_name, pretrained, ..., enable_fusion,
fusion_type)`): looks up the audio model config by name, overrides
`text_cfg.model_type` with tmodel_name, builds CLAP, loads the checkpoint's
`state_dict` (stripping a `module.` DDP prefix). The image-CLIP RN/ViT
presets are unused by any audio path and not registered here; their towers
and preset table live in `vision_towers.py` (inventory completeness).

The config table below re-types `model_configs/*.json` (audio entries);
all share text_cfg {context_length 77, vocab 49408, width 512, heads 8,
layers 12} except PANN-14-tiny-transformer (layers 4).
"""

from __future__ import annotations

from typing import Optional, Tuple

from audiolcm_tpu.models.open_clap.htsat import HTSATConfig, htsat_preset
from audiolcm_tpu.models.open_clap.model import OpenClap, OpenClapConfig
from audiolcm_tpu.models.open_clap.pann import PannConfig

# name -> (embed_dim, audio kwargs); defaults: 48 kHz, win 1024, hop 480,
# 64 mel, fmin 50, fmax 14000, 527 classes
MODEL_CONFIGS = {
    "HTSAT-tiny": (768, dict(kind="HTSAT", model_name="tiny")),
    "HTSAT-base": (1024, dict(kind="HTSAT", model_name="base")),
    "HTSAT-large": (2048, dict(kind="HTSAT", model_name="large")),
    "HTSAT-tiny-win-1536": (768, dict(kind="HTSAT", model_name="tiny",
                                      window_size_stft=1536)),
    "PANN-14": (2048, dict(kind="PANN", model_name="Cnn14")),
    "PANN-10": (1024, dict(kind="PANN", model_name="Cnn10")),
    "PANN-6": (512, dict(kind="PANN", model_name="Cnn6")),
    "PANN-14-fmax-18k": (2048, dict(kind="PANN", model_name="Cnn14",
                                    fmax=18000.0)),
    "PANN-14-fmax-8k-20s": (2048, dict(kind="PANN", model_name="Cnn14",
                                       fmax=8000.0, hop_size=360)),
    "PANN-14-win-1536": (2048, dict(kind="PANN", model_name="Cnn14",
                                    window_size=1536)),
    "PANN-14-tiny-transformer": (2048, dict(kind="PANN", model_name="Cnn14",
                                            text_layers=4)),
}


def list_models():
    return sorted(MODEL_CONFIGS)


def build_config(amodel_name: str, tmodel_name: str,
                 enable_fusion: bool = False,
                 fusion_type: str = "None") -> OpenClapConfig:
    amodel_name = amodel_name.replace("/", "-")
    if amodel_name not in MODEL_CONFIGS:
        raise RuntimeError(
            f"Model config for {amodel_name} not found; "
            f"available models {list_models()}.")
    embed_dim, spec = MODEL_CONFIGS[amodel_name]
    spec = dict(spec)
    kind = spec.pop("kind")
    text_layers = spec.pop("text_layers", 12)
    if kind == "HTSAT":
        name = spec.pop("model_name")
        audio = htsat_preset(name, enable_fusion=enable_fusion,
                             fusion_type=fusion_type, **spec)
    else:
        audio = PannConfig(enable_fusion=enable_fusion,
                           fusion_type=fusion_type, **spec)
    return OpenClapConfig(embed_dim=embed_dim, audio=audio,
                          text_model_type=tmodel_name,
                          text_layers=text_layers)


def create_model(amodel_name: str, tmodel_name: str,
                 pretrained: str = "",
                 enable_fusion: bool = False,
                 fusion_type: str = "None",
                 ) -> Tuple[OpenClap, OpenClapConfig, Optional[dict]]:
    """Returns (module, config, params-or-None). With a `pretrained` torch
    checkpoint path, params are converted via convert.convert_open_clap."""
    cfg = build_config(amodel_name, tmodel_name, enable_fusion, fusion_type)
    model = OpenClap(cfg)
    params = None
    if pretrained:
        from audiolcm_tpu.convert.load_torch import load_state_dict
        from audiolcm_tpu.models.open_clap.convert import convert_open_clap

        sd = load_state_dict(pretrained)
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        params = convert_open_clap(sd, cfg)
    return model, cfg, params
