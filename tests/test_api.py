"""Integration test: reference-format checkpoint + YAML -> wav file on disk.

Builds a complete synthetic LCM_audio Lightning checkpoint (teacher/student/
target DiT, VAE, CLAP-BERT + T5 towers, scale_factor), a vocoder directory
(best_netG.pt + args.yml), and an audiolcm.yaml-schema config — then runs
the full AudioLCMInfer path minus the real tokenizers.
"""

import os

import numpy as np
import pytest
import yaml

import jax

from tests.test_convert import _synthetic_bigvgan_sd, _synthetic_dit_sd, _synthetic_vae_sd

import jax.numpy as jnp

from audiolcm_tpu.api import AudioLCMBatchInfer, AudioLCMInfer, build_pipeline
from audiolcm_tpu.models.bigvgan import BigVGANConfig
from audiolcm_tpu.models.vae1d import VAEConfig


class StubTokenizers:
    max_length = 7

    def __call__(self, ori, struct):
        ids = np.arange(self.max_length)[None, :].repeat(len(ori), 0) % 13
        return jnp.asarray(ids), jnp.asarray(ids)


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel
    from transformers import T5Config as HFT5Config, T5EncoderModel

    root = tmp_path_factory.mktemp("ckpts")
    in_ch, ctx, hidden, depth = 4, 16, 32, 1

    # --- LCM checkpoint -----------------------------------------------------
    sd = {}
    for prefix in ("model.diffusion_model.", "unet.diffusion_model.",
                   "target_unet.diffusion_model."):
        for k, v in _synthetic_dit_sd(in_ch, ctx, hidden, depth, 64).items():
            sd[prefix + k] = torch.from_numpy(v * 0.05)

    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), attn_layers=(),
                        kernel_size=5, z_channels=in_ch, embed_dim=in_ch)
    for k, v in _synthetic_vae_sd(vae_cfg).items():
        sd["first_stage_model." + k] = torch.from_numpy(v * 0.05)

    torch.manual_seed(0)
    hf_bert = BertModel(
        HFBertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=16),
        add_pooling_layer=False,
    )
    for k, v in hf_bert.state_dict().items():
        sd["cond_stage_model.caption_encoder.base." + k] = v
    proj_rng = np.random.default_rng(0)
    sd["cond_stage_model.caption_encoder.projection.linear1.weight"] = torch.from_numpy(
        proj_rng.standard_normal((ctx, 16)).astype(np.float32) * 0.1)
    sd["cond_stage_model.caption_encoder.projection.linear2.weight"] = torch.from_numpy(
        proj_rng.standard_normal((ctx, ctx)).astype(np.float32) * 0.1)
    sd["cond_stage_model.caption_encoder.projection.layer_norm.weight"] = torch.ones(ctx)
    sd["cond_stage_model.caption_encoder.projection.layer_norm.bias"] = torch.zeros(ctx)

    hf_t5 = T5EncoderModel(
        HFT5Config(vocab_size=30, d_model=ctx, d_kv=8, d_ff=24, num_layers=1,
                   num_heads=2, feed_forward_proj="gated-gelu", dropout_rate=0.0))
    for k, v in hf_t5.state_dict().items():
        sd["cond_stage_model.t5_transformer." + k] = v

    sd["scale_factor"] = torch.tensor(0.5)
    ckpt_path = root / "audiolcm_tiny.ckpt"
    torch.save({"state_dict": sd}, ckpt_path)

    # --- vocoder dir --------------------------------------------------------
    voc_cfg = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                            upsample_kernel_sizes=(8, 4),
                            upsample_initial_channel=16,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),))
    voc_dir = root / "vocoder"
    voc_dir.mkdir()
    voc_sd = {k: torch.from_numpy(v * 0.05)
              for k, v in _synthetic_bigvgan_sd(voc_cfg).items()}
    torch.save({"generator": voc_sd}, voc_dir / "best_netG.pt")
    with open(voc_dir / "args.yml", "w") as f:
        yaml.safe_dump({
            "num_mels": 8, "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
            "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "activation": "snakebeta",
            "snake_logscale": True, "resblock": "1",
        }, f)

    # --- config YAML (audiolcm.yaml schema) ---------------------------------
    config = {
        "model": {
            "base_learning_rate": 3.0e-6,
            "target": "ldm.models.diffusion.lcm_audio.LCM_audio",
            "params": {
                "linear_start": 0.00085, "linear_end": 0.012, "timesteps": 1000,
                "mel_dim": in_ch, "mel_length": 8, "num_ddim_timesteps": 50,
                "w_min": 4, "w_max": 12, "use_lcm": True, "scale_by_std": True,
                "unet_config": {
                    "target": "ldm.modules.diffusionmodules.concatDiT.ConcatDiT2MLP",
                    "params": {"in_channels": in_ch, "context_dim": ctx,
                               "hidden_size": hidden, "num_heads": 4,
                               "depth": depth, "max_len": 64},
                },
                "first_stage_config": {
                    "target": "ldm.models.autoencoder1d.AutoencoderKL",
                    "params": {
                        "embed_dim": in_ch,
                        "ddconfig": {"double_z": True, "in_channels": 8, "out_ch": 8,
                                     "z_channels": in_ch, "kernel_size": 5, "ch": 32,
                                     "ch_mult": [1, 2], "num_res_blocks": 1,
                                     "attn_layers": [], "down_layers": [0],
                                     "dropout": 0.0},
                    },
                },
                "cond_stage_config": {
                    "target": "ldm.modules.encoders.modules.FrozenCLAPFLANEmbedder",
                    "params": {
                        "weights_path": "unused-in-tests",
                        "d_proj": ctx,
                        "bert_config": {"vocab_size": 30, "hidden_size": 16,
                                        "num_layers": 1, "num_heads": 2,
                                        "intermediate_size": 32,
                                        "max_position_embeddings": 16},
                        "t5_config": {"vocab_size": 30, "d_model": ctx, "d_kv": 8,
                                      "d_ff": 24, "num_layers": 1, "num_heads": 2},
                    },
                },
            },
        },
    }
    cfg_path = root / "audiolcm_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return str(cfg_path), str(ckpt_path), str(voc_dir)


def test_build_pipeline_and_infer(synthetic_ckpt, tmp_path):
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    pipeline = build_pipeline(cfg_path, ckpt_path, voc_dir)
    outdir = str(tmp_path / "out")
    path = AudioLCMInfer(
        "a dog barks in the park",
        config_path=cfg_path, model_path=ckpt_path, vocoder_path=voc_dir,
        outdir=outdir, pipeline=pipeline, tokenizers=StubTokenizers(),
    )
    assert os.path.exists(path)
    assert path.endswith("a-dog-barks-in-the-park_0.wav")
    from scipy.io import wavfile

    sr, wav = wavfile.read(path)
    assert sr == 16000
    # latent 8 frames -> mel 16 -> wav 16*8
    assert wav.shape == (128,)


def test_batch_infer(synthetic_ckpt, tmp_path):
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    pipeline = build_pipeline(cfg_path, ckpt_path, voc_dir)
    outdir = str(tmp_path / "out")
    last = AudioLCMBatchInfer(
        ["dog barks", "cat meows", "rain falls"],
        config_path=cfg_path, model_path=ckpt_path, vocoder_path=voc_dir,
        outdir=outdir, batch_size=2, pipeline=pipeline, tokenizers=StubTokenizers(),
    )
    assert last.endswith("rain-falls_0.wav")
    assert len(os.listdir(outdir)) >= 3


def test_build_pipeline_serving_flags(synthetic_ckpt):
    """compute_dtype/use_flash wiring: explicit overrides are honored and
    the DiT module is cloned with the flash flag."""
    import jax.numpy as jnp

    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    pipe = build_pipeline(cfg_path, ckpt_path, voc_dir,
                          compute_dtype=jnp.bfloat16, use_flash=True,
                          fast_snake=True)
    assert pipe.modules.dit.use_flash is True
    assert pipe.modules.vocoder.config.fast_snake is True
    assert pipe.compute_dtype == jnp.bfloat16
    leaves = [l for l in jax.tree.leaves(pipe.params) if hasattr(l, "dtype")]
    assert any(l.dtype == jnp.bfloat16 for l in leaves)


def test_build_pipeline_default_attention_is_einsum(synthetic_ckpt):
    """The serving default is the XLA einsum attention on every backend:
    at the production DiT shape (seq 467, head_dim 72) it measured 1.21x
    faster than the Pallas flash kernel (tools/bench_dit.py ab, DESIGN.md
    round-3 verdicts). Flash is opt-in for longer sequences."""
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    pipe = build_pipeline(cfg_path, ckpt_path, voc_dir)
    assert pipe.modules.dit.use_flash is False


def test_prewarm_buckets_serves_lattice_warm(synthetic_ckpt, tmp_path, monkeypatch):
    """Round-4 serving feature: prewarm_buckets AOT-persists one generate
    executable per (batch, mel-bucket); generate_jit prefers the registered
    executable; a second prewarm (fresh pipeline) loads binaries instead of
    compiling."""
    import numpy as np

    from audiolcm_tpu.api import prewarm_buckets

    monkeypatch.setenv("AUDIOLCM_AOT_CACHE", str(tmp_path / "aot"))
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    pipe = build_pipeline(cfg_path, ckpt_path, voc_dir)
    # tiny buckets (mel 16/32 -> latent 8/16); tok_len matches StubTokenizers
    hows = prewarm_buckets(pipe, batch_sizes=(2,), mel_buckets=(16, 32),
                           tok_len=7)
    assert set(hows) == {(2, 8), (2, 16)}
    ids = jnp.asarray(np.arange(7)[None, :].repeat(2, 0) % 13)
    rng = jax.random.PRNGKey(0)
    wav_aot, _ = pipe.generate_jit(rng, ids, ids, 16)
    # bypass the registry for the plain-jit reference output
    wav_jit, _ = pipe._generate_ids_jit(pipe.params, rng, ids, ids, 16)
    np.testing.assert_allclose(np.asarray(wav_aot), np.asarray(wav_jit),
                               atol=1e-6)

    pipe2 = build_pipeline(cfg_path, ckpt_path, voc_dir)
    hows2 = prewarm_buckets(pipe2, batch_sizes=(2,), mel_buckets=(16, 32),
                            tok_len=7)
    assert all(h == "loaded" for h in hows2.values()), hows2
