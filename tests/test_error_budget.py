"""End-to-end serving error budget (VERDICT r2 #5).

The bench/serving default turns on four numerics knobs at once: bf16
weights+activations, fast_snake (polynomial cos), the fused Pallas AMP
stages, and Pallas flash attention. Each has a measured per-op error story
(DESIGN.md), but until real checkpoints allow CLAP/FAD this test is the only
end-to-end guard: it runs the FULL generate() on structured random weights
with each knob alone and with all knobs together, against the exact
f32/XLA path, and pins a max-waveform-deviation budget per knob so a
regression names its culprit.

Reference numerics being approximated: exact cos snake
(`vocoder/bigvgan/activations.py:107-119`), f32 torch pipeline
(`NAT_mel.py:64-85`). Output scale: tanh-bounded waveform in [-1, 1].

Budgets are pinned at ~10x the values measured on 2026-08-18 (seeded and
CPU-pinned by conftest, so deterministic up to compiler reassociation; the
headroom absorbs that). Measured (max |dwav|): flash 3.7e-9, fused 1.9e-9,
fast_snake 2.8e-9, bf16 1.44e-4, ALL 1.44e-4 — the composed default stack
is bf16-dominated; the three kernel knobs sit at f32 rounding noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.lcm import LCMConfig
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig
from audiolcm_tpu.pipeline import (
    AudioLCMPipeline,
    PipelineModules,
    PipelineParams,
    cast_params,
)

LATENT_LEN = 64  # -> mel 128 frames -> stage T of 512 (C=8) / 1024 (C=4)

# max |wav_knob - wav_exact| over the full clip, ~10x measured (module doc)
BUDGETS = {
    "flash": 5.0e-8,
    "fused": 5.0e-8,
    "fast_snake": 5.0e-8,
    "bf16": 1.5e-3,
    "all": 1.5e-3,
}


def _generate(bf16=False, fast_snake=False, fused=False, flash=False):
    """Full pipeline generate() with the given knobs; fixed rng/weights."""
    rng = jax.random.PRNGKey(0)
    dit = ConcatDiT2MLP(in_channels=4, context_dim=16, hidden_size=32,
                        depth=1, num_heads=4, max_len=128, use_flash=flash)
    vae = AutoencoderKL1D(
        VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                  num_res_blocks=1, down_layers=(0,), attn_layers=(),
                  kernel_size=5, z_channels=4, embed_dim=4))
    voc = BigVGAN(
        BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                      upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=16,
                      resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),),
                      fast_snake=fast_snake),
        # C=4 stage (T=1024) fuses; C=8 stage (T=512) is below 2 tiles and
        # stays on XLA — both dispatch branches covered
        pallas_stage_max_channels=8 if fused else 0,
        pallas_interpret=True,
    )

    dit_p = dit.init(rng, jnp.zeros((1, 8, 4)), jnp.zeros((1,)),
                     jnp.zeros((1, 6, 16)), jnp.zeros((1, 256)))["params"]
    vae_p = vae.init(rng, jnp.zeros((1, 16, 8)), rng)["params"]
    voc_p = voc.init(rng, jnp.zeros((1, 16, 8)))["params"]
    # structured: break init symmetry so snakes/convs aren't degenerate
    mix = np.random.default_rng(7)
    jitter = lambda a: a + jnp.asarray(
        mix.standard_normal(a.shape).astype(np.float32) * 0.02)
    dit_p, vae_p, voc_p = (jax.tree.map(jitter, p)
                           for p in (dit_p, vae_p, voc_p))

    params = PipelineParams(dit=dit_p, vae=vae_p, vocoder=voc_p,
                            clap_text=None, t5=None, scale_factor=0.5)
    pipe = AudioLCMPipeline(
        PipelineModules(dit=dit, vae=vae, vocoder=voc,
                        clap_text=None, t5=None),
        params, lcm_config=LCMConfig(num_inference_steps=2))
    if bf16:
        pipe.params = cast_params(pipe.params, jnp.bfloat16)
        pipe.compute_dtype = jnp.bfloat16

    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    if bf16:
        ctx = ctx.astype(jnp.bfloat16)
    wav, _ = pipe.generate_from_context(jax.random.PRNGKey(0), ctx,
                                        LATENT_LEN)
    return np.asarray(wav, dtype=np.float32)


@pytest.fixture(scope="module")
def exact_wav():
    return _generate()


@pytest.mark.parametrize("knob,kwargs", [
    ("flash", dict(flash=True)),
    ("fused", dict(fused=True)),
    ("fast_snake", dict(fast_snake=True)),
    ("bf16", dict(bf16=True)),
    ("all", dict(bf16=True, fast_snake=True, fused=True, flash=True)),
])
def test_serving_knob_error_budget(exact_wav, knob, kwargs):
    wav = _generate(**kwargs)
    assert wav.shape == exact_wav.shape
    assert np.isfinite(wav).all()
    dev = float(np.max(np.abs(wav - exact_wav)))
    assert dev < BUDGETS[knob], (
        f"knob {knob!r} deviates {dev:.3e} from the exact f32 path "
        f"(budget {BUDGETS[knob]:.1e}) — this knob regressed")
