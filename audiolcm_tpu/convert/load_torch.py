"""Torch checkpoint file loading and LCM-checkpoint splitting.

torch (CPU) is only used here, at the file edge; everything downstream
works on flat {name: numpy} dicts. Mirrors the reference load paths:
  * Lightning ckpt with 'state_dict' (`ddpm.py:185-201`)
  * vocoder dir with best_netG.pt['generator'] + args.yml
    (`models.py:393-404`)
  * CLAP_weights_2022.pth['model'] with 'caption_encoder.' prefixes
    (`encoders/modules.py:534-538`)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import yaml

Array = np.ndarray
SD = Dict[str, Array]


def load_state_dict(path: str, key: Optional[str] = "auto") -> SD:
    """Load a torch file to a flat numpy dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if key == "auto":
        for k in ("state_dict", "model", "generator"):
            if isinstance(obj, dict) and k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    elif key is not None:
        obj = obj[key]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def strip_prefix(sd: SD, prefix: str) -> SD:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def split_lcm_state_dict(sd: SD) -> Dict[str, object]:
    """Split a full LCM_audio Lightning state_dict into per-model dicts.

    Checkpoint layout (lcm_audio.py:44-116): `model.diffusion_model.*` is the
    frozen teacher, `unet.diffusion_model.*` the student (used at inference,
    `scheduling_lcm.py:374`), `target_unet.diffusion_model.*` the EMA target,
    `first_stage_model.*` the VAE, `cond_stage_model.*` the CLAP+T5 towers,
    and `scale_factor` the latent-std rescale.
    """
    out: Dict[str, object] = {
        "teacher": strip_prefix(sd, "model.diffusion_model."),
        "student": strip_prefix(sd, "unet.diffusion_model."),
        "target": strip_prefix(sd, "target_unet.diffusion_model."),
        "vae": strip_prefix(sd, "first_stage_model."),
        "clap": strip_prefix(sd, "cond_stage_model.caption_encoder."),
        "t5": strip_prefix(sd, "cond_stage_model.t5_transformer."),
    }
    out["scale_factor"] = float(sd["scale_factor"]) if "scale_factor" in sd else 1.0
    return out


def load_vocoder_dir(ckpt_dir: str):
    """(state_dict, args_dict) from a reference vocoder directory."""
    sd = load_state_dict(os.path.join(ckpt_dir, "best_netG.pt"), key="generator")
    with open(os.path.join(ckpt_dir, "args.yml")) as f:
        args = yaml.safe_load(f)
    return sd, args


def load_clap_caption_encoder(path: str) -> SD:
    """caption_encoder.* weights from CLAP_weights_2022.pth."""
    sd = load_state_dict(path, key="model")
    return strip_prefix(sd, "caption_encoder.")
