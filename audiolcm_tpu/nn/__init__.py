from audiolcm_tpu.nn.embeddings import (
    guidance_scale_embedding,
    timestep_embedding,
)
from audiolcm_tpu.nn.attention import MultiHeadSelfAttention
from audiolcm_tpu.nn.convff import Conv1dGEGLUFeedForward

__all__ = [
    "guidance_scale_embedding",
    "timestep_embedding",
    "MultiHeadSelfAttention",
    "Conv1dGEGLUFeedForward",
]
