"""North-star benchmark: audio-seconds generated per second per chip (RTF).

Runs the full production-size 2-step LCM generation path (token ids ->
CLAP-BERT+T5 -> 2x DiT -> VAE decode -> BigVGAN x256 -> 160k-sample wav)
as one jitted XLA program on the available chip, batch 8, 10 s clips.
Weights are zero/random-initialized (reference checkpoints are not shipped);
the measured graph is identical to the checkpoint-loaded one.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the BASELINE.md north-star of 10x real-time per chip.
"""

import json
import os
import subprocess
import sys
import time

# ---------------------------------------------------------------------------
# Tunnel resilience (VERDICT r2 #1): the TPU backend behind the axon tunnel
# flaps — round 2's driver bench died with UNAVAILABLE at the FIRST backend
# touch before any repo code ran. Strategy:
#   1. Probe the backend in a fresh SUBPROCESS with a hard timeout (an
#      in-process init failure is cached by jax and poisons the process),
#      retrying with backoff for up to AUDIOLCM_BENCH_PROBE_SECS (default
#      20 min).
#   2. Only after a probe succeeds, init the backend in THIS process.
#   3. If the backend dies mid-run anyway, re-exec the script from scratch
#      (bounded by AUDIOLCM_BENCH_ATTEMPTS) — warm caches make the retry
#      cheap.
# ---------------------------------------------------------------------------

_MAX_ATTEMPTS = int(os.environ.get("AUDIOLCM_BENCH_ATTEMPTS", "4"))


def _await_backend() -> None:
    """Block until a throwaway subprocess can see the TPU; die loudly after
    the probe budget. Probe output goes to stderr; stdout stays clean for
    the single JSON result line."""
    budget = float(os.environ.get("AUDIOLCM_BENCH_PROBE_SECS", "1200"))
    deadline = time.time() + budget
    delay = 10.0
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, capture_output=True, text=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"bench: backend up after {attempt} probes",
                          file=sys.stderr)
                return
            err = (r.stderr or "").strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = "probe timed out after 240s"
        print(f"bench: backend probe {attempt} failed ({err}); "
              f"{max(0, deadline - time.time()):.0f}s of budget left",
              file=sys.stderr)
        if time.time() + delay > deadline:
            raise SystemExit(
                f"bench: TPU backend unavailable after {budget:.0f}s of "
                f"probing ({attempt} attempts)")
        time.sleep(delay)
        delay = min(delay * 1.7, 120.0)


def _reexec_or_die(stage: str, exc: BaseException) -> None:
    """A backend failure mid-run poisons jax's cached backend state; the only
    clean retry is a fresh process. Bounded by AUDIOLCM_BENCH_ATTEMPT."""
    n = int(os.environ.get("AUDIOLCM_BENCH_ATTEMPT", "1"))
    print(f"bench: backend failure during {stage} (attempt {n}): "
          f"{type(exc).__name__}: {exc}", file=sys.stderr)
    if n >= _MAX_ATTEMPTS:
        raise SystemExit(
            f"bench: giving up after {n} attempts (stage: {stage})")
    env = dict(os.environ, AUDIOLCM_BENCH_ATTEMPT=str(n + 1))
    sys.stderr.flush()
    sys.stdout.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _is_backend_failure(exc: BaseException) -> bool:
    txt = f"{type(exc).__name__}: {exc}"
    return any(s in txt for s in (
        "UNAVAILABLE", "Unable to initialize backend", "DEADLINE_EXCEEDED",
        "FAILED_PRECONDITION", "INTERNAL", "Socket closed", "connection",
    ))


_await_backend()

import jax

# Persistent compilation cache: the first full-pipeline compile takes
# minutes on the tunneled device; cached executables cut reruns to seconds.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import jax.numpy as jnp


def zeros_init(model, *example_args):
    """Fast parameter tree of zeros with the exact init structure."""
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *example_args))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def zeros_params_program(shape_trees: dict, compute_dtype):
    """All synthetic params as host numpy zeros + ONE device_put.

    The tunneled axon runtime mirrors every program OUTPUT back to the host
    at ~4.4 MB/s, so creating ~1 GB of params with device-side zeros (either
    leaf-by-leaf jnp.zeros or one jitted zeros program) costs 6-8 min of a
    warm bench. Plain uploads run ~50 MB/s (10x faster) and host-side
    np.zeros is calloc — measured with tools/probe_tunnel_cost.py:
    512 MB zeros output 117 s, 600 tiny outputs 2 s, 64 MB device_put 1.3 s."""
    import numpy as np

    def z(s):
        dt = (compute_dtype if jnp.issubdtype(s.dtype, jnp.floating)
              else s.dtype)
        return np.zeros(s.shape, dt)

    return jax.device_put(jax.tree.map(z, shape_trees))


def build_bench_pipeline(batch=8, latent_len=312, tok_len=77):
    """The production serving pipeline exactly as the bench measures it
    (env knobs: AUDIOLCM_BENCH_DTYPE / AUDIOLCM_FAST_SNAKE /
    AUDIOLCM_PALLAS_STAGE_MAX). Returns (pipe, clap_ids, t5_ids, knobs)."""
    import os

    import jax.numpy as jnp

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
    )
    # serving config: bf16 weights/activations, XLA einsum attention
    dtype_name = os.environ.get("AUDIOLCM_BENCH_DTYPE", "bfloat16")
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    # XLA einsum attention beats the Pallas flash kernel at the production
    # DiT shape (20.06 vs 24.33 ms/forward, tools/bench_dit.py ab): head_dim
    # 72 fills 72/128 lanes in the flash kernel while seq 467 keeps einsum's
    # logits cheap. AUDIOLCM_FLASH=1 opts back in (longer sequences).
    use_flash = os.environ.get("AUDIOLCM_FLASH", "0") == "1"

    # fast_snake: polynomial cos in the vocoder snakes — error (<5e-7) is far
    # below the bf16 serving output resolution (tested); set =0 for exact cos
    fast_snake = os.environ.get("AUDIOLCM_FAST_SNAKE", "1") == "1"
    # pallas_stage: stages with C <= this run as one fused Pallas kernel
    # (2.4x over the cf XLA path at C=24; see nn/pallas_amp_stage.py).
    # 48 fuses the two narrowest stages: 254.6 -> 312.1x realtime. Cold
    # Mosaic compile of the unrolled stages is tens of minutes — the
    # persistent cache above makes reruns cheap.
    pallas_max = int(os.environ.get("AUDIOLCM_PALLAS_STAGE_MAX", "48"))
    # fused-stage conv formulation: "tap" (default) | "mstack" (see
    # nn/pallas_amp_stage.py:valid_conv_cl_mstack)
    stage_conv = os.environ.get("AUDIOLCM_STAGE_CONV", "tap")
    # dynamic-int8 resblock convs for stages with ch >= this (0 = off; see
    # nn/int8_conv.py)
    int8_min = int(os.environ.get("AUDIOLCM_INT8_MIN", "0"))
    # fused text-tower projections: Q/K/V (and T5's gated-FF pair) as single
    # wider matmuls — numerics-preserving (see models/t5_encoder.py:
    # fuse_t5_params)
    fuse_text = os.environ.get("AUDIOLCM_FUSE_TEXT", "1") == "1"
    # DiT Q/K/V as one matmul (numerics-preserving; see nn/attention.py:
    # fuse_attention_params)
    fuse_qkv = os.environ.get("AUDIOLCM_FUSE_QKV", "0") == "1"
    # batch-1 overlap-discard fold of the XLA vocoder stages (nn/fold.py):
    # exact (halo >= stage RF) and inert at batch > 1, so on by default —
    # 107.1 -> 50.6 ms on the XLA-only b1 vocoder at fold=8
    # (tools/bench_b1_fold.py, v5e). 0 disables.
    fold_t = int(os.environ.get("AUDIOLCM_FOLD_T", "8"))
    modules = PipelineModules(
        dit=ConcatDiT2MLP(use_flash=use_flash, fuse_qkv=fuse_qkv),
        vae=AutoencoderKL1D(VAEConfig()),
        vocoder=BigVGAN(BigVGANConfig(fast_snake=fast_snake),
                        pallas_stage_max_channels=pallas_max,
                        pallas_stage_conv=stage_conv,
                        int8_min_channels=int8_min,
                        fold_t_segments=fold_t),
        clap_text=ClapTextEncoder(BertConfig(), fuse_proj=fuse_text),
        t5=T5Encoder(T5Config(), fuse_proj=fuse_text),
    )

    clap_ids = jnp.zeros((batch, tok_len), dtype=jnp.int32)
    t5_ids = jnp.zeros((batch, tok_len), dtype=jnp.int32)
    dit_args = (
        jnp.zeros((1, latent_len, modules.dit.in_channels)),
        jnp.zeros((1,), dtype=jnp.int32),
        jnp.zeros((1, 2 * tok_len, modules.dit.context_dim)),
        jnp.zeros((1, 256)),
    )
    rng = jax.random.PRNGKey(0)
    shapes = {
        "dit": jax.eval_shape(
            lambda: modules.dit.init(rng, *dit_args))["params"],
        "vae": jax.eval_shape(
            lambda: modules.vae.init(rng, jnp.zeros((1, 16, 80)), rng))["params"],
        "vocoder": jax.eval_shape(
            lambda: modules.vocoder.init(rng, jnp.zeros((1, 16, 80))))["params"],
        "clap_text": jax.eval_shape(
            lambda: modules.clap_text.init(rng, clap_ids[:1]))["params"],
        "t5": jax.eval_shape(
            lambda: modules.t5.init(rng, t5_ids[:1]))["params"],
    }
    trees = zeros_params_program(shapes, compute_dtype)
    params = PipelineParams(scale_factor=1.0, **trees)
    pipe = AudioLCMPipeline(
        modules, params, lcm_config=LCMConfig(num_inference_steps=2),
        compute_dtype=compute_dtype,
    )
    knobs = (dtype_name, fast_snake, pallas_max, stage_conv, int8_min,
             fuse_text, fuse_qkv, fold_t)
    return pipe, clap_ids, t5_ids, knobs


# ---------------------------------------------------------------------------
# Bench configs (BASELINE.md matrix). `python bench.py` (the driver's
# invocation) runs the default b8/10 s serving config and prints the same
# single JSON line as always; AUDIOLCM_BENCH_CONFIG (or argv[1]) selects the
# other BASELINE rows:
#   b8_10s    — default: batch 8, 10 s clips (BASELINE config #2 shape)
#   b1_10s    — batch-1 single-prompt latency (config #1)
#   b8_20s    — the 1248-mel/20 s long-form bucket
#   musiccaps — the 640-mel bucket 99.9% of musiccap.tsv lands on (config #5)
#   vae       — 1D-VAE round-trip mel->latent->mel->wav (config #3)
#   teacher   — 100-step DDIM teacher path, batch-doubled CFG (config #4)
# ---------------------------------------------------------------------------

def _timed_queued(gen, iters):
    """Queue `iters` executions and force one scalar at the end (the only
    reliable completion barrier on the tunneled axon runtime)."""
    keys = [jax.random.PRNGKey(i) for i in range(iters)]
    jax.block_until_ready(keys)
    start = time.perf_counter()
    wav = None
    for i in range(iters):
        wav = gen(keys[i])
    float(jnp.sum(wav))
    return time.perf_counter() - start, wav


def _emit(metric, value, unit, vs_baseline, **extra):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    if extra:
        rec["extra"] = extra
    print(json.dumps(rec))


def bench_generate(batch, latent_len, metric, iters=None, latency=False):
    """Generate-path RTF at an arbitrary (batch, bucket) point."""
    pipe, clap_ids, t5_ids, knobs = build_bench_pipeline(
        batch=batch, latent_len=latent_len)
    rng = jax.random.PRNGKey(0)
    from audiolcm_tpu.aot import load_or_compile

    aot_args = (pipe.params, rng, clap_ids, t5_ids, latent_len)
    aot_extra = ("bench",) + knobs + (batch, latent_len, 77)
    gen_exec, how = load_or_compile(
        "bench_generate" if (batch, latent_len) == (8, 312)
        else f"bench_generate_b{batch}_l{latent_len}",
        pipe._generate_ids_jit, aot_args, extra=aot_extra)
    gen = lambda r: gen_exec(pipe.params, r, clap_ids, t5_ids)[0]
    wav = gen(rng)
    float(jnp.sum(wav))  # warm
    clip_sec = wav.shape[-1] / 16000.0
    iters = iters or int(os.environ.get("AUDIOLCM_BENCH_ITERS", "20"))
    if latency:
        # per-call forced latency: each iteration waits for its value. The
        # tunnel charges a host roundtrip per fetch, so the median over
        # `iters` calls is reported alongside the queued throughput.
        lats = []
        for i in range(iters):
            k = jax.random.PRNGKey(i)
            jax.block_until_ready(k)
            t0 = time.perf_counter()
            float(jnp.sum(gen(k)))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        med = lats[len(lats) // 2]
        elapsed, _ = _timed_queued(gen, iters)
        rtf = iters * batch * clip_sec / elapsed
        _emit(metric, round(med * 1000.0, 2), "ms_per_clip",
              round(clip_sec * 1000.0 / med / 10.0, 3),
              queued_x_realtime=round(rtf, 2), batch=batch,
              latent_len=latent_len, aot=how)
    else:
        elapsed, _ = _timed_queued(gen, iters)
        rtf = iters * batch * clip_sec / elapsed
        _emit(metric, round(rtf, 2), "x_realtime", round(rtf / 10.0, 3),
              ms_per_batch=round(1000.0 * elapsed / iters, 2), batch=batch,
              latent_len=latent_len, clip_sec=clip_sec, aot=how)


def bench_vae_roundtrip():
    """BASELINE config #3: mel -> VAE encode -> sample -> decode -> BigVGAN
    (`scripts/reconstruct_audio.py:115-122` parity shape, b8 10 s)."""
    batch, mel_len = 8, 624
    pipe, _clap, _t5, knobs = build_bench_pipeline(batch=batch)
    from audiolcm_tpu.aot import load_or_compile
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian

    vae, vocoder = pipe.modules.vae, pipe.modules.vocoder
    dtype = pipe.compute_dtype

    def roundtrip(params, mel, rng):
        moments = vae.apply({"params": params.vae}, mel.astype(dtype),
                            method=AutoencoderKL1D.encode_moments)
        z = DiagonalGaussian(moments).sample(rng)
        recon = vae.apply({"params": params.vae}, z.astype(dtype),
                          method=AutoencoderKL1D.decode)
        wav = vocoder.apply({"params": params.vocoder}, recon)
        return wav.astype(jnp.float32)

    mel = jnp.zeros((batch, mel_len, 80), dtype)
    rng = jax.random.PRNGKey(0)
    rt_exec, how = load_or_compile(
        "bench_vae_roundtrip", jax.jit(roundtrip),
        (pipe.params, mel, rng), extra=("vae",) + knobs + (batch, mel_len))
    gen = lambda r: rt_exec(pipe.params, mel, r)
    wav = gen(rng)
    float(jnp.sum(wav))
    clip_sec = wav.shape[-1] / 16000.0
    iters = int(os.environ.get("AUDIOLCM_BENCH_ITERS", "20"))
    elapsed, _ = _timed_queued(gen, iters)
    rtf = iters * batch * clip_sec / elapsed
    _emit("vae_roundtrip_audio_sec_per_sec_b8", round(rtf, 2), "x_realtime",
          round(rtf / 10.0, 3), ms_per_batch=round(1000 * elapsed / iters, 2),
          aot=how)


def bench_teacher():
    """BASELINE config #4: 100-step DDIM teacher sampling (batch-doubled CFG,
    `scripts/txt2audio_for_2cap.py:227-229`) + decode + vocode, b8 10 s."""
    batch, latent_len = 8, 312
    pipe, _clap, _t5, knobs = build_bench_pipeline(batch=batch)
    from audiolcm_tpu.aot import load_or_compile

    ctx = jnp.zeros((batch, 154, 1024), pipe.compute_dtype)
    uncond = jnp.zeros((1, 154, 1024), pipe.compute_dtype)
    rng = jax.random.PRNGKey(0)
    fn = jax.jit(pipe._generate_teacher, static_argnums=(4, 5, 6, 7))
    t_exec, how = load_or_compile(
        "bench_teacher", fn,
        (pipe.params, rng, ctx, uncond, latent_len, 100, 5.0, False),
        extra=("teacher",) + knobs + (batch, latent_len, 100))
    gen = lambda r: t_exec(pipe.params, r, ctx, uncond)[0]
    wav = gen(rng)
    float(jnp.sum(wav))
    clip_sec = wav.shape[-1] / 16000.0
    iters = int(os.environ.get("AUDIOLCM_BENCH_ITERS", "5"))
    elapsed, _ = _timed_queued(gen, iters)
    rtf = iters * batch * clip_sec / elapsed
    _emit("teacher_ddim100_audio_sec_per_sec_b8", round(rtf, 2), "x_realtime",
          round(rtf / 10.0, 3), ms_per_batch=round(1000 * elapsed / iters, 2),
          aot=how)


def main():
    cfg = os.environ.get("AUDIOLCM_BENCH_CONFIG", "")
    if len(sys.argv) > 1 and not sys.argv[1].startswith("-"):
        cfg = sys.argv[1]
    if cfg in ("", "b8_10s", "default"):
        pass  # fall through to the driver's default path below
    elif cfg == "b1_10s":
        return bench_generate(1, 312, "latency_ms_per_clip_2step_lcm_b1",
                              latency=True)
    elif cfg == "b8_20s":
        return bench_generate(8, 624,
                              "audio_sec_generated_per_sec_per_chip_2step_lcm_b8_20s")
    elif cfg == "musiccaps":
        return bench_generate(8, 320,
                              "audio_sec_generated_per_sec_per_chip_2step_lcm_b8_musiccaps")
    elif cfg == "vae":
        return bench_vae_roundtrip()
    elif cfg == "teacher":
        return bench_teacher()
    else:
        raise SystemExit(f"bench: unknown config {cfg!r}")

    batch, latent_len, tok_len = 8, 312, 77  # 10 s: mel 624, wav 159744 @16k
    pipe, clap_ids, t5_ids, knobs = build_bench_pipeline(batch, latent_len, tok_len)
    rng = jax.random.PRNGKey(0)

    # AOT executable cache: a warm process otherwise pays a full trace +
    # lowering of the generate program (~minutes on small hosts); loading the
    # persisted compiled executable skips straight to execution.
    # AUDIOLCM_NO_AOT=1 falls back to the plain jit dispatch path (A/B knob:
    # the Compiled call path and jit's C++ fast path are not identical).
    if os.environ.get("AUDIOLCM_NO_AOT", "0") == "1":
        gen = lambda r: pipe._generate_ids_jit(
            pipe.params, r, clap_ids, t5_ids, latent_len)
        how = "jit"
    else:
        from audiolcm_tpu.aot import load_or_compile

        aot_args = (pipe.params, rng, clap_ids, t5_ids, latent_len)
        aot_extra = ("bench",) + knobs + (batch, latent_len, tok_len)
        gen_exec, how = load_or_compile(
            "bench_generate", pipe._generate_ids_jit, aot_args,
            extra=aot_extra,
        )
        gen = lambda r: gen_exec(pipe.params, r, clap_ids, t5_ids)

    def force(x):
        # NOTE: jax.block_until_ready does NOT await completion on the
        # tunneled axon runtime (measured: it reports PFLOP/s); fetching a
        # scalar value is the only reliable completion barrier.
        return float(jnp.sum(x))

    # warmup — and the stale-AOT guard: a persisted executable keyed before a
    # libtpu roll can deserialize fine yet fail at first execution. Purge the
    # artifact and recompile once from clean before treating the failure as
    # a backend flap.
    try:
        wav, _ = gen(rng)
        force(wav)
    except Exception as exc:
        if how == "loaded":
            from audiolcm_tpu.aot import load_or_compile, purge

            print(f"bench: loaded AOT executable failed at call time "
                  f"({type(exc).__name__}: {exc}); purging and recompiling",
                  file=sys.stderr)
            purge("bench_generate")
            gen_exec, how = load_or_compile(
                "bench_generate", pipe._generate_ids_jit, aot_args,
                extra=aot_extra,
            )
            gen = lambda r: gen_exec(pipe.params, r, clap_ids, t5_ids)
            wav, _ = gen(rng)
            force(wav)
        else:
            raise

    # Steady-state throughput: queue `iters` executions back-to-back and
    # force one scalar at the end. Keys are materialized BEFORE the timed
    # region (each PRNGKey(i) is its own tiny dispatch — on the tunneled
    # runtime that serializes ~ms of RPC into the loop), and the iteration
    # count amortizes the single scalar-fetch roundtrip: at 5 iters the
    # tunnel overhead charged ~9 ms/iter vs the xplane-measured 233.5 ms
    # device busy (tools/xplane_timeline.py).
    iters = int(os.environ.get("AUDIOLCM_BENCH_ITERS", "20"))
    keys = [jax.random.PRNGKey(i) for i in range(iters)]
    jax.block_until_ready(keys)
    start = time.perf_counter()
    for i in range(iters):
        wav, _ = gen(keys[i])
    # device executes programs in order: forcing the last iteration's value
    # bounds the wall-clock of all of them
    force(wav)
    elapsed = time.perf_counter() - start

    audio_seconds = iters * batch * (wav.shape[-1] / 16000.0)
    rtf = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_sec_generated_per_sec_per_chip_2step_lcm_b8",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        if _is_backend_failure(e):
            _reexec_or_die("main", e)
        raise
