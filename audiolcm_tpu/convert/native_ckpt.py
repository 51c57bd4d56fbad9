"""Native checkpoint format: orbax snapshots of PipelineParams.

Torch-checkpoint conversion (load_torch + torch_to_flax) is the migration
path; once converted, pipelines save/load natively so serving never touches
torch again. A single directory holds the full param pytree plus a small
JSON sidecar with the LCM/schedule constants needed to rebuild the
pipeline.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from audiolcm_tpu.diffusion.lcm import LCMConfig
from audiolcm_tpu.pipeline import AudioLCMPipeline, PipelineParams


def save_pipeline(path: str, pipeline: AudioLCMPipeline) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), pipeline.params)
        ckptr.wait_until_finished()
    meta = {
        "default_latent_len": pipeline.default_latent_len,
        "lcm": {
            "num_inference_steps": pipeline.lcm_config.num_inference_steps,
            "original_inference_steps": pipeline.lcm_config.original_inference_steps,
            "guidance_scale": pipeline.lcm_config.guidance_scale,
        },
        "num_timesteps": int(pipeline.schedule.num_timesteps),
    }
    with open(os.path.join(path, "pipeline.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_pipeline_params(
    path: str, template: PipelineParams
) -> Tuple[PipelineParams, dict]:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"), template)
    with open(os.path.join(path, "pipeline.json")) as f:
        meta = json.load(f)
    return params, meta


def load_pipeline(path: str, modules, template: PipelineParams,
                  schedule=None) -> AudioLCMPipeline:
    params, meta = load_pipeline_params(path, template)
    lcm = LCMConfig(**meta["lcm"])
    return AudioLCMPipeline(
        modules, params, schedule=schedule, lcm_config=lcm,
        default_latent_len=meta.get("default_latent_len", 312),
    )
