"""Secondary benchmarks for the remaining BASELINE.md configs.

  3. 1D-VAE round-trip: mel -> encode -> decode -> BigVGAN wav
  4. Teacher path: 100-step DDIM (batch-doubled CFG) vs 2-step LCM
  5. Long-form (MusicCaps-style): 2-step LCM at the 624- and 1000-frame
     latent buckets (20 s / 32 s clips)

Prints one JSON line per config (the primary driver metric stays bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=3):
    force(fn(*args)[0] if isinstance(fn(*args), tuple) else fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    force(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def main():
    from bench import zeros_init

    from audiolcm_tpu.diffusion.ddim import DDIMConfig, ddim_sample
    from audiolcm_tpu.diffusion.lcm import LCMConfig
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian, VAEConfig
    from audiolcm_tpu.pipeline import (
        AudioLCMPipeline,
        PipelineModules,
        PipelineParams,
        cast_params,
    )

    dtype = jnp.bfloat16
    batch = 8
    rng = jax.random.PRNGKey(0)
    use_flash = jax.default_backend() == "tpu"

    dit = ConcatDiT2MLP(use_flash=use_flash)
    vae = AutoencoderKL1D(VAEConfig())
    voc = BigVGAN(BigVGANConfig())
    dit_p = zeros_init(dit, jnp.zeros((1, 312, 20)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 154, 1024)), jnp.zeros((1, 256)))["params"]
    vae_p = zeros_init(vae, jnp.zeros((1, 16, 80)), rng)["params"]
    voc_p = zeros_init(voc, jnp.zeros((1, 16, 80)))["params"]
    params = cast_params(
        PipelineParams(dit=dit_p, vae=vae_p, vocoder=voc_p, scale_factor=1.0), dtype
    )
    modules = PipelineModules(dit=dit, vae=vae, vocoder=voc)
    schedule = NoiseSchedule.linear()

    # --- config 3: VAE roundtrip + vocode ----------------------------------
    mel = jnp.zeros((batch, 624, 80), dtype)

    @jax.jit
    def roundtrip(p, mel, rng):
        moments = vae.apply({"params": p.vae}, mel, method=AutoencoderKL1D.encode_moments)
        z = DiagonalGaussian(moments).sample(rng)
        rec = vae.apply({"params": p.vae}, z, method=AutoencoderKL1D.decode)
        return voc.apply({"params": p.vocoder}, rec)

    t = timeit(lambda p, m: roundtrip(p, m, rng), params, mel)
    audio_s = batch * 624 * 256 / 16000
    print(json.dumps({"metric": "vae_roundtrip_plus_vocode_rtf_b8", "value": round(audio_s / t, 2),
                      "unit": "x_realtime"}))

    # --- config 4: teacher 100-step DDIM vs 2-step LCM ----------------------
    ctx = jnp.zeros((batch, 154, 1024), dtype)
    uncond = jnp.zeros((1, 154, 1024), dtype)

    def denoise(x, tt, c):
        return dit.apply({"params": params.dit}, x.astype(dtype), tt, c, None).astype(jnp.float32)

    teacher = jax.jit(lambda p, r: ddim_sample(
        denoise, schedule, r, (batch, 312, 20), ctx, uncond,
        DDIMConfig(num_steps=100, guidance_scale=5.0)))
    t_teacher = timeit(lambda p, r: teacher(p, r), params, rng)

    pipe = AudioLCMPipeline(modules, params, schedule,
                            LCMConfig(num_inference_steps=2), compute_dtype=dtype)
    lcm = jax.jit(lambda p, r: pipe._sample_latent(p, r, ctx, 312))
    t_lcm = timeit(lambda p, r: lcm(p, r), params, rng)
    print(json.dumps({"metric": "teacher_ddim100_vs_lcm2_latms_b8",
                      "value": {"ddim100_ms": round(t_teacher * 1e3, 1),
                                "lcm2_ms": round(t_lcm * 1e3, 1),
                                "speedup": round(t_teacher / t_lcm, 1)}}))

    # --- config 5: long-form buckets ---------------------------------------
    for latent_len, label in ((624, "20s"), (844, "27s")):  # max latent = max_len(1000) - 155 prefix tokens
        gen = jax.jit(lambda p, r, c: pipe._generate_from_context(p, r, c, latent_len),
                      static_argnums=())
        cc = jnp.zeros((batch, 154, 1024), dtype)
        tt = timeit(lambda p, r: gen(p, r, cc)[0], params, rng)
        audio_s = batch * latent_len * 2 * 256 / 16000
        print(json.dumps({"metric": f"longform_{label}_2step_lcm_rtf_b8",
                          "value": round(audio_s / tt, 2), "unit": "x_realtime"}))


if __name__ == "__main__":
    main()
