from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.diffusion.lcm import (
    LCMConfig,
    boundary_scalings,
    lcm_inference_timesteps,
    lcm_sample,
)

__all__ = [
    "NoiseSchedule",
    "LCMConfig",
    "boundary_scalings",
    "lcm_inference_timesteps",
    "lcm_sample",
]
