"""End-to-end pipeline smoke test: token ids -> waveform with tiny models."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.lcm import LCMConfig
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.clap_text import BertConfig, ClapTextEncoder
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig
from audiolcm_tpu.pipeline import AudioLCMPipeline, PipelineModules, PipelineParams


def tiny_pipeline(with_text=True, ctx_dim=16):
    rng = jax.random.PRNGKey(0)
    dit = ConcatDiT2MLP(
        in_channels=4, context_dim=ctx_dim, hidden_size=32, depth=1, num_heads=4,
        max_len=128,
    )
    vae = AutoencoderKL1D(
        VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                  down_layers=(0,), attn_layers=(), kernel_size=5, z_channels=4,
                  embed_dim=4)
    )
    voc = BigVGAN(
        BigVGANConfig(num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=16, resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),))
    )
    clap = ClapTextEncoder(
        BertConfig(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
                   intermediate_size=32, max_position_embeddings=32),
        d_proj=ctx_dim,
    ) if with_text else None
    t5 = T5Encoder(
        T5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=24, num_layers=1, num_heads=2)
    ) if with_text else None

    dit_p = dit.init(rng, jnp.zeros((1, 8, 4)), jnp.zeros((1,)),
                     jnp.zeros((1, 6, ctx_dim)), jnp.zeros((1, 256)))["params"]
    vae_p = vae.init(rng, jnp.zeros((1, 16, 8)), rng)["params"]
    voc_p = voc.init(rng, jnp.zeros((1, 16, 8)))["params"]
    clap_p = clap.init(rng, jnp.zeros((1, 7), dtype=jnp.int32))["params"] if with_text else None
    t5_p = t5.init(rng, jnp.zeros((1, 7), dtype=jnp.int32))["params"] if with_text else None

    # T5 context half must project to ctx_dim: use a T5 with d_model == ctx_dim
    modules = PipelineModules(dit=dit, vae=vae, vocoder=voc, clap_text=clap, t5=t5)
    params = PipelineParams(dit=dit_p, vae=vae_p, vocoder=voc_p, clap_text=clap_p,
                            t5=t5_p, scale_factor=0.5)
    return AudioLCMPipeline(modules, params, lcm_config=LCMConfig(num_inference_steps=2))


def test_generate_from_context():
    pipe = tiny_pipeline(with_text=False)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    wav, mel = pipe.generate_from_context_jit(jax.random.PRNGKey(0), ctx, 8)
    # latent 8 -> mel 16 frames -> wav 16*8=128 samples
    assert mel.shape == (2, 16, 8)
    assert wav.shape == (2, 128)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_generate_from_tokens():
    pipe = tiny_pipeline(with_text=True, ctx_dim=16)
    clap_ids = jnp.zeros((1, 3), dtype=jnp.int32)
    t5_ids = jnp.ones((1, 3), dtype=jnp.int32)
    ctx = pipe.encode_text_ids(clap_ids, t5_ids)
    assert ctx.shape == (1, 6, 16)
    wav, mel = pipe.generate_from_context(jax.random.PRNGKey(0), ctx, 8)
    assert wav.shape == (1, 128)


def test_generate_deterministic_given_rng():
    pipe = tiny_pipeline(with_text=False)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    w1, _ = pipe.generate_from_context_jit(jax.random.PRNGKey(7), ctx, 8)
    w2, _ = pipe.generate_from_context_jit(jax.random.PRNGKey(7), ctx, 8)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
