"""Per-stage timing of the generation pipeline on the attached device.

Times each stage as its own jitted program (text towers, LCM scan, VAE
decode, BigVGAN vocode) to show where the milliseconds go and guide kernel
work. Not the official bench (that's bench.py).

Usage: python tools/profile_stages.py [batch] [latent_len] [dtype]
"""

import sys
import time

import jax
import jax.numpy as jnp


def _force(out):
    # block_until_ready does not await on the tunneled axon runtime; fetch a
    # scalar to guarantee completion
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=5):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import zeros_init

    from audiolcm_tpu.diffusion.lcm import LCMConfig
    from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from audiolcm_tpu.models.clap_text import BertConfig, ClapTextEncoder
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig
    from audiolcm_tpu.pipeline import (
        AudioLCMPipeline,
        PipelineModules,
        PipelineParams,
        cast_params,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    latent_len = int(sys.argv[2]) if len(sys.argv) > 2 else 312
    dtype = jnp.bfloat16 if (len(sys.argv) < 4 or sys.argv[3] == "bf16") else jnp.float32
    use_flash = jax.default_backend() == "tpu"

    fast_snake = os.environ.get("AUDIOLCM_FAST_SNAKE", "1") == "1"
    cf_max = int(os.environ.get("AUDIOLCM_CF_MAX", "48"))
    # match bench.py's production serving config: fuse stages with C <= this
    # as single Pallas kernels (0 = off)
    pallas_max = int(os.environ.get("AUDIOLCM_PALLAS_STAGE_MAX", "48"))
    modules = PipelineModules(
        dit=ConcatDiT2MLP(use_flash=use_flash),
        vae=AutoencoderKL1D(VAEConfig()),
        vocoder=BigVGAN(BigVGANConfig(fast_snake=fast_snake), cf_max_channels=cf_max,
                        pallas_stage_max_channels=pallas_max),
        clap_text=ClapTextEncoder(BertConfig()),
        t5=T5Encoder(T5Config()),
    )
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((batch, 77), dtype=jnp.int32)
    params = PipelineParams(
        dit=zeros_init(modules.dit, jnp.zeros((1, latent_len, 20)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 154, 1024)), jnp.zeros((1, 256)))["params"],
        vae=zeros_init(modules.vae, jnp.zeros((1, 16, 80)), rng)["params"],
        vocoder=zeros_init(modules.vocoder, jnp.zeros((1, 16, 80)))["params"],
        clap_text=zeros_init(modules.clap_text, ids[:1])["params"],
        t5=zeros_init(modules.t5, ids[:1])["params"],
        scale_factor=1.0,
    )
    params = cast_params(params, dtype)
    pipe = AudioLCMPipeline(modules, params,
                            lcm_config=LCMConfig(num_inference_steps=2),
                            compute_dtype=dtype)

    text = jax.jit(lambda p, a, b: pipe._encode_text_ids(p, a, b))
    lcm = jax.jit(lambda p, r, c: pipe._sample_latent(p, r, c, latent_len),
                  static_argnums=())
    dec = jax.jit(lambda p, z: pipe._decode_latent(p, z))
    voc = jax.jit(lambda p, m: modules.vocoder.apply({"params": p.vocoder}, m))

    ctx = jnp.zeros((batch, 154, 1024), dtype)
    z = jnp.zeros((batch, latent_len, 20), jnp.float32)
    mel = jnp.zeros((batch, 2 * latent_len, 80), dtype)

    t_text = timeit(text, params, ids, ids)
    t_lcm = timeit(lcm, params, rng, ctx)
    t_dec = timeit(dec, params, z)
    t_voc = timeit(voc, params, mel)
    total = t_text + t_lcm + t_dec + t_voc
    audio_s = batch * (2 * latent_len * 256) / 16000
    for name, t in [("text", t_text), ("lcm_2step", t_lcm), ("vae_decode", t_dec),
                    ("bigvgan", t_voc)]:
        print(f"{name:12s} {t * 1e3:8.2f} ms  ({100 * t / total:5.1f}%)")
    print(f"{'total':12s} {total * 1e3:8.2f} ms -> {audio_s / total:.1f}x realtime")


if __name__ == "__main__":
    main()
