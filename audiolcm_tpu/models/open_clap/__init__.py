"""LAION open_clap tree, TPU-native (`ldm/modules/encoders/open_clap/`).

Implements the pieces the reference vendors: CLAP model (audio + text
towers, joint projections, logit scales), HTSAT Swin audio transformer,
PANN CNNs, attentional feature fusion, the named-config factory, the
torch-checkpoint converter, and — for inventory completeness — the
image-CLIP vision towers (ModifiedResNet / VisualTransformer + RN/ViT
presets in `vision_towers.py`) that the reference carries as dead code
(its CLAP never instantiates them; ckpt loading pops `visual.*` keys).
"""

from audiolcm_tpu.models.open_clap.factory import (
    MODEL_CONFIGS,
    build_config,
    create_model,
    list_models,
)
from audiolcm_tpu.models.open_clap.fusion import AFF, daf, iAFF
from audiolcm_tpu.models.open_clap.htsat import HTSAT, HTSATConfig, htsat_preset
from audiolcm_tpu.models.open_clap.model import (
    MLPLayers,
    OpenClap,
    OpenClapConfig,
)
from audiolcm_tpu.models.open_clap.pann import PannAudioBranch, PannConfig
from audiolcm_tpu.models.open_clap.text_towers import (
    BartConfig,
    BartEncoder,
    ClipTextTransformer,
    RobertaConfig,
    RobertaEncoder,
)
from audiolcm_tpu.models.open_clap.tokenizer import (
    ClipBpeTokenizer,
    tokenize,
)
from audiolcm_tpu.models.open_clap.convert import (
    convert_bart,
    convert_modified_resnet,
    convert_open_clap,
    convert_roberta,
    convert_visual_transformer,
)
from audiolcm_tpu.models.open_clap.vision_towers import (
    VISION_PRESETS,
    ModifiedResNet,
    VisualTransformer,
    build_vision_tower,
)
from audiolcm_tpu.models.open_clap.embedders import (
    FrozenLAIONCLAPEmbedder,
    FrozenLAIONCLAPSetenceEmbedder,
)
from audiolcm_tpu.models.open_clap.loss import (
    ClipLossConfig,
    clip_loss,
    gather_features,
)

__all__ = [
    "AFF", "daf", "iAFF", "HTSAT", "HTSATConfig", "htsat_preset",
    "PannAudioBranch", "PannConfig", "ClipTextTransformer", "RobertaConfig",
    "RobertaEncoder", "MLPLayers", "OpenClap", "OpenClapConfig",
    "MODEL_CONFIGS", "build_config", "create_model", "list_models",
    "convert_open_clap", "convert_roberta", "FrozenLAIONCLAPEmbedder",
    "FrozenLAIONCLAPSetenceEmbedder", "VISION_PRESETS", "ModifiedResNet",
    "VisualTransformer", "build_vision_tower", "convert_modified_resnet",
    "convert_visual_transformer",
]
