"""On-chip training-step benchmark (VERDICT r3 'Next round' #2).

Times ONE jitted production-shape training step for each of the four
training paths the reference runs on 8 GPUs, on whatever single chip is
available here:

  lcm      — LCM consistency distillation (3 DiT fwd + 1 bwd + AdamW + EMA),
             batch 8, latent 312, ctx (154, 1024)  [configs/audiolcm.yaml;
             main.py:781-788 trains this at DDP bs 8/GPU]
  teacher  — eps-MSE teacher LDM step, batch 4     [configs/teacher.yaml:102]
  vae      — VAE-GAN generator + discriminator steps (adaptive d_weight's
             two extra backwards + R1 grad-of-grad), batch 4, mel 624x80
             [configs/autoencoder1d.yaml:61]
  vocoder  — BigVGAN GAN gen + disc steps, batch 32, segment 8192
             [vocoder/bigvgan/bigvgan_audioset16khz_80band.json]

Protocol: queue AUDIOLCM_BENCH_ITERS (default 10) steps back-to-back with the
state threaded through (donated), then force one scalar — the only reliable
completion barrier on the tunneled axon runtime (see bench.py). Emits one
JSON line per path with step_ms, steps/s, and an MFU estimate from XLA's
compiled cost analysis against the chip's bf16 peak.

Usage: python tools/bench_train.py [lcm|teacher|vae|vocoder ...]
       (no args = all four). AUDIOLCM_TRAIN_DTYPE=bfloat16 casts params to
       bf16 (default float32, matching the reference's fp32 training).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# bf16 peak matmul throughput per chip, for the MFU denominator.
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e: 197 TFLOP/s bf16
    "TPU v5": 459e12,
    "TPU v4": 275e12,
}


def _peak() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "")
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12


def _dtype():
    return (jnp.bfloat16
            if os.environ.get("AUDIOLCM_TRAIN_DTYPE", "float32") == "bfloat16"
            else jnp.float32)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def _emit(path, step_ms, flops, extra=None):
    """One JSON line per benched path."""
    peak = _peak()
    rec = {
        "path": path,
        "step_ms": round(step_ms, 2),
        "steps_per_sec": round(1000.0 / step_ms, 3),
    }
    if flops:
        rec["flops_per_step"] = float(flops)
        rec["mfu_vs_bf16_peak"] = round(flops / (step_ms / 1000.0) / peak, 4)
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    sys.stdout.flush()


def _time_steps(step_fn, state, step_args, loss_key, iters, label):
    """Compile, then queue `iters` state-threaded steps and force a scalar."""
    t0 = time.perf_counter()
    compiled = step_fn.lower(state, *step_args).compile()
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops")
    except Exception:
        pass
    # warm once (donation means we must keep threading the fresh state)
    state, metrics = compiled(state, *step_args)
    float(jax.tree.leaves(metrics)[0])
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = compiled(state, *step_args)
    loss = float(metrics[loss_key])  # completion barrier: scalar fetch
    elapsed = time.perf_counter() - start
    assert loss == loss, f"{label}: NaN loss"
    return elapsed / iters * 1000.0, flops, compile_s, loss


def bench_lcm(iters):
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.train.lcm_distill import (
        Batch, LCMDistillConfig, init_train_state, make_lcm_distill_step)

    dtype = _dtype()
    model = ConcatDiT2MLP()
    rng = jax.random.PRNGKey(0)
    batch, latent_len, ctx_len = 8, 312, 154
    x0 = jnp.zeros((1, latent_len, model.in_channels))
    teacher = model.init(rng, x0, jnp.zeros((1,), jnp.int32),
                         jnp.zeros((1, ctx_len, model.context_dim)),
                         jnp.zeros((1, 256)))["params"]
    teacher = _cast(teacher, dtype)
    cfg = LCMDistillConfig()
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)

    def apply_fn(p, x, t, ctx, w):
        return model.apply({"params": p}, x.astype(dtype), t,
                           ctx.astype(dtype),
                           None if w is None else w.astype(dtype))

    step = jax.jit(make_lcm_distill_step(apply_fn, NoiseSchedule.linear(), cfg),
                   donate_argnums=(0,))
    batch_tree = Batch(
        z=jax.random.normal(jax.random.PRNGKey(1), (batch, latent_len, 20), dtype),
        context=jax.random.normal(jax.random.PRNGKey(2),
                                  (batch, ctx_len, 1024), dtype))
    uncond = jnp.zeros((1, ctx_len, 1024), dtype)
    ms, flops, comp, loss = _time_steps(
        step, state, (teacher, batch_tree, uncond, rng), "train/loss",
        iters, "lcm")
    n_params = sum(p.size for p in jax.tree.leaves(teacher))
    _emit("lcm_distill_b8", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 5),
           "dit_params_m": round(n_params / 1e6, 1),
           "note": "3 DiT fwd + bwd + AdamW + EMA, latent 312"})


def bench_teacher(iters):
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.train.teacher import (
        TeacherConfig, init_teacher_state, make_teacher_step)

    dtype = _dtype()
    model = ConcatDiT2MLP()
    rng = jax.random.PRNGKey(0)
    batch, latent_len, ctx_len = 4, 312, 154
    params = model.init(rng, jnp.zeros((1, latent_len, 20)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, ctx_len, 1024)),
                        jnp.zeros((1, 256)))["params"]
    params = _cast(params, dtype)

    def apply_fn(p, x, t, ctx, w=None):
        return model.apply({"params": p}, x.astype(dtype), t, ctx.astype(dtype), None)

    cfg = TeacherConfig()
    state = init_teacher_state(params, cfg)
    step = jax.jit(make_teacher_step(apply_fn, NoiseSchedule.linear(), cfg),
                   donate_argnums=(0,))
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, latent_len, 20), dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, ctx_len, 1024), dtype)
    ms, flops, comp, loss = _time_steps(
        step, state, (z, ctx, rng), "train/loss", iters, "teacher")
    _emit("teacher_ldm_b4", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 5),
           "note": "eps-MSE DiT fwd+bwd + AdamW, latent 312"})


def bench_vae(iters):
    from audiolcm_tpu.models.discriminators import NLayerDiscriminator2D
    from audiolcm_tpu.models.vae1d import (
        AutoencoderKL1D, DiagonalGaussian, VAEConfig)
    from audiolcm_tpu.train.vae_gan import (
        VAEGANConfig, init_vae_gan_state, make_vae_gan_steps)

    dtype = _dtype()
    vae = AutoencoderKL1D(VAEConfig())
    disc = NLayerDiscriminator2D(ndf=64, n_layers=3)
    rng = jax.random.PRNGKey(0)
    batch, spec_len = 4, 624
    mel = jax.random.normal(rng, (batch, spec_len, 80), dtype)
    ae_params = _cast(vae.init(rng, mel[:1], rng)["params"], dtype)
    disc_vars = disc.init(rng, jnp.zeros((1, 80, spec_len, 1)))
    disc_params = _cast(disc_vars["params"], dtype)
    disc_stats = disc_vars.get("batch_stats", {})

    def vae_apply(params, x, r):
        moments = vae.apply({"params": params}, x.astype(dtype),
                            method=AutoencoderKL1D.encode_moments)
        post = DiagonalGaussian(moments)
        recon = vae.apply({"params": params}, post.sample(r),
                          method=AutoencoderKL1D.decode)
        return recon, post

    def disc_apply(params, stats, x, train):
        if train:
            logits, updates = disc.apply(
                {"params": params, "batch_stats": stats}, x.astype(dtype),
                train=True, mutable=["batch_stats"])
            return logits, updates["batch_stats"]
        logits = disc.apply({"params": params, "batch_stats": stats},
                            x.astype(dtype), train=False)
        return logits, stats

    cfg = VAEGANConfig(disc_start=0)  # past disc_start: the expensive regime
    gen_step, disc_step = make_vae_gan_steps(vae_apply, disc_apply, cfg)
    # both states up front, from copies: the first timed step DONATES its
    # state, deleting the param buffers it aliases
    copy = lambda t: jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, t)
    state = init_vae_gan_state(ae_params, disc_params, disc_stats, cfg)
    state = state._replace(step=jnp.ones((), jnp.int32))
    state_d = init_vae_gan_state(copy(ae_params), copy(disc_params),
                                 copy(disc_stats), cfg)
    state_d = state_d._replace(step=jnp.ones((), jnp.int32))

    g = jax.jit(gen_step, donate_argnums=(0,))
    ms, flops, comp, loss = _time_steps(
        g, state, (mel, rng), "train/total_loss", iters, "vae_gen")
    _emit("vae_gan_gen_b4", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 2),
           "note": "recon + adaptive d_weight (2 extra last-layer bwd), mel 624"})

    state = state_d
    d = jax.jit(disc_step, donate_argnums=(0,))
    ms, flops, comp, loss = _time_steps(
        d, state, (mel, rng), "train/disc_loss", iters, "vae_disc")
    _emit("vae_gan_disc_b4", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 2),
           "note": "LSGAN + R1 grad-of-grad on PatchGAN"})


def bench_vocoder(iters):
    from audiolcm_tpu.dsp.mel import MelConfig
    from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from audiolcm_tpu.models.vocoder_discriminators import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator)
    from audiolcm_tpu.train.vocoder_gan import (
        VocoderGANConfig, make_vocoder_gan_steps)

    dtype = _dtype()
    # layout A/B knobs (VERDICT r4 #7): AUDIOLCM_MPD_FOLD=width|batch,
    # AUDIOLCM_DISC_PAIR=0|1 (one 2B apply per sub-disc instead of two),
    # AUDIOLCM_MRD_STFT=fft|matmul (DFT-as-matmul MRD spectrograms)
    fold = os.environ.get("AUDIOLCM_MPD_FOLD", "width")
    pair = os.environ.get("AUDIOLCM_DISC_PAIR", "0") == "1"
    mrd_mm = os.environ.get("AUDIOLCM_MRD_STFT", "fft") == "matmul"
    # AUDIOLCM_MEL_STFT=fft|matmul: same DFT-as-matmul formulation for the
    # gen step's 45*L1 mel-loss spectrograms (two mels + their grads/step)
    mel_mm = os.environ.get("AUDIOLCM_MEL_STFT", "fft") == "matmul"
    gen = BigVGAN(BigVGANConfig())
    mpd = MultiPeriodDiscriminator(fold_mode=fold, pair_batch=pair)
    mrd = MultiResolutionDiscriminator(pair_batch=pair, stft_matmul=mrd_mm)
    rng = jax.random.PRNGKey(0)
    batch, segment, hop = 32, 8192, 256
    frames = segment // hop + 1
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    wav = jax.random.normal(rng, (batch, frames * hop), dtype) * 0.1
    gen_params = _cast(gen.init(rng, mel[:1])["params"], dtype)
    mpd_params = _cast(mpd.init(rng, wav[:1], wav[:1])["params"], dtype)
    mrd_params = _cast(mrd.init(rng, wav[:1], wav[:1])["params"], dtype)
    loss_mel_cfg = MelConfig(fmin=125.0, fmax=8000.0, stft_matmul=mel_mm)
    gen_step, disc_step, init_state = make_vocoder_gan_steps(
        lambda p, m: gen.apply({"params": p}, m.astype(dtype)),
        lambda p, y, yh: mpd.apply({"params": p}, y.astype(dtype), yh.astype(dtype)),
        lambda p, y, yh: mrd.apply({"params": p}, y.astype(dtype), yh.astype(dtype)),
        VocoderGANConfig(), loss_mel_cfg)

    copy = lambda t: jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, t)
    state = init_state(gen_params, mpd_params, mrd_params)
    state_g = init_state(copy(gen_params), copy(mpd_params), copy(mrd_params))
    d = jax.jit(disc_step, donate_argnums=(0,))
    ms, flops, comp, loss = _time_steps(
        d, state, (mel, wav), "train/disc_loss", iters, "voc_disc")
    _emit("vocoder_gan_disc_b32", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 2),
           "note": f"MPD+MRD LSGAN, segment 8192, fold={fold} pair={int(pair)} "
                   f"mrd_stft={'matmul' if mrd_mm else 'fft'}"})

    state = state_g
    g = jax.jit(gen_step, donate_argnums=(0,))
    ms, flops, comp, loss = _time_steps(
        g, state, (mel, wav), "train/gen_loss", iters, "voc_gen")
    _emit("vocoder_gan_gen_b32", ms, flops,
          {"compile_s": round(comp, 1), "loss": round(loss, 2),
           "note": f"45*L1-mel + FM + adv, gen fwd+bwd through MPD+MRD, "
                   f"fold={fold} pair={int(pair)} "
                   f"mrd_stft={'matmul' if mrd_mm else 'fft'} "
                   f"mel_stft={'matmul' if mel_mm else 'fft'}"})


def main():
    paths = sys.argv[1:] or ["lcm", "teacher", "vae", "vocoder"]
    iters = int(os.environ.get("AUDIOLCM_BENCH_ITERS", "10"))
    fns = {"lcm": bench_lcm, "teacher": bench_teacher,
           "vae": bench_vae, "vocoder": bench_vocoder}
    for p in paths:
        fns[p](iters)


if __name__ == "__main__":
    main()
