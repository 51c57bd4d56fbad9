from audiolcm_tpu.convert.torch_to_flax import (
    convert_bert,
    convert_bigvgan,
    convert_clap_text_encoder,
    convert_dit,
    convert_t5_encoder,
    convert_vae,
    fold_weight_norm,
)

__all__ = [
    "convert_bert",
    "convert_bigvgan",
    "convert_clap_text_encoder",
    "convert_dit",
    "convert_t5_encoder",
    "convert_vae",
    "fold_weight_norm",
]
