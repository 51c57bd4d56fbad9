"""Golden tests: open_clap image towers (ModifiedResNet / VisualTransformer)
vs the reference's OWN classes (`ldm/modules/encoders/open_clap/model.py`),
random weights through the converter. These towers are unreachable dead code
in the reference's audio pipeline (CLAP builds only audio+text branches,
`model.py:420-549`) — ported + verified for inventory completeness.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiolcm_tpu.models.open_clap.convert import (
    convert_modified_resnet,
    convert_visual_transformer,
)
from audiolcm_tpu.models.open_clap.vision_towers import (
    VISION_PRESETS,
    ModifiedResNet,
    VisualTransformer,
    build_vision_tower,
)
from tests.ref_loader import load_reference_open_clap_model

OC = load_reference_open_clap_model()


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_modified_resnet_matches_reference():
    torch.manual_seed(0)
    ref = OC.ModifiedResNet(layers=(2, 1, 1, 2), output_dim=24, heads=4,
                            image_size=64, width=16).eval()
    ours = ModifiedResNet(layers=(2, 1, 1, 2), output_dim=24, heads=4,
                          image_size=64, width=16)
    # non-trivial running stats so the BN conversion is actually exercised
    with torch.no_grad():
        ref.train()
        for _ in range(2):
            ref(torch.randn(4, 3, 64, 64))
        ref.eval()
    variables = convert_modified_resnet(_np_sd(ref))
    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        golden = ref(torch.from_numpy(x)).numpy()
    out = ours.apply({"params": variables["params"],
                      "batch_stats": variables["batch_stats"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), golden, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("quick", [False, True])
def test_visual_transformer_matches_reference(quick):
    torch.manual_seed(0)
    act = OC.QuickGELU if quick else torch.nn.GELU
    ref = OC.VisualTransformer(image_size=32, patch_size=8, width=32,
                               layers=2, heads=4, output_dim=16,
                               act_layer=act).eval()
    ours = VisualTransformer(image_size=32, patch_size=8, width=32, layers=2,
                             heads=4, output_dim=16, quick_gelu=quick)
    variables = convert_visual_transformer(_np_sd(ref))
    x = np.random.default_rng(2).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        golden = ref(torch.from_numpy(x)).numpy()
    out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), golden, atol=2e-5, rtol=1e-4)


def test_vision_presets_match_reference_jsons():
    import json
    import os

    cfg_dir = ("/root/reference/ldm/modules/encoders/open_clap/model_configs")
    for name, preset in VISION_PRESETS.items():
        with open(os.path.join(cfg_dir, f"{name}.json")) as f:
            ref_cfg = json.load(f)
        v = ref_cfg["vision_cfg"]
        assert ref_cfg["embed_dim"] == preset.embed_dim, name
        layers = tuple(v["layers"]) if isinstance(v["layers"], list) else v["layers"]
        assert layers == preset.layers, name
        assert v["width"] == preset.width, name
        assert v["image_size"] == preset.image_size, name
        if v["patch_size"] is not None:
            assert v["patch_size"] == preset.patch_size, name
        # CLIP head-count formulae: RN attnpool = width*32//64, ViT = width//64
        if isinstance(layers, tuple):
            assert preset.heads == v["width"] * 32 // 64, name
        else:
            assert preset.heads == v["width"] // 64, name


def test_build_vision_tower_shapes():
    tower = build_vision_tower("ViT-B-32")
    assert isinstance(tower, VisualTransformer) and tower.output_dim == 512
    tower = build_vision_tower("RN50")
    assert isinstance(tower, ModifiedResNet) and tower.output_dim == 1024


def test_reference_clap_has_no_vision_branch():
    """Documents WHY these towers are dead code: the reference CLAP
    never constructs a visual branch from its vision_cfg."""
    import inspect

    src = inspect.getsource(OC.CLAP.__init__)
    assert "ModifiedResNet(" not in src and "VisualTransformer(" not in src
