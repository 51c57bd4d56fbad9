"""Per-op device timings of the production generate program via an xplane
trace — the only trustworthy per-op timing on the tunneled axon runtime
(external per-op timing is floored at ~3 ms dispatch; see DESIGN.md).

Runs the exact bench.py graph (same env knobs, warm via the AOT/compile
caches), captures one traced iteration, then aggregates XLA op durations
from the device plane, grouped into pipeline stages by op-name patterns.

Usage: python tools/profile_xplane.py [top_n]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/xplane_prof"

# Profiled configuration (env-overridable so the shape signatures below
# track the actual run instead of silently misattributing at non-default
# batch/duration — ADVICE r3 #3).
BATCH = int(os.environ.get("AUDIOLCM_PROF_BATCH", "8"))
LATENT = int(os.environ.get("AUDIOLCM_PROF_LATENT", "312"))
TOK = int(os.environ.get("AUDIOLCM_PROF_TOK", "77"))


def build_stage_patterns(batch: int, latent: int, tok: int):
    """op-name substring -> stage bucket (checked in order; first hit wins).

    jax names fusions after the jaxpr eqn names inside, which carry the flax
    module scope (e.g. "vocoder/resblock_4_0/..."); XLA fusions that drop
    the scope still carry operand shapes in the HLO text, which are unique
    per pipeline stage. Shape signatures are DERIVED from the profiled
    config: DiT seq = 1 + 2*tok + latent; vocoder stage k sees
    T = 2*latent*prod(rates[:k+1]) at C = 1536/2^(k+1) (rates 4,4,2,2,2,2);
    VAE T_lat=latent C=20 / mel (2*latent)x80; text towers tok tokens.
    """
    seq = 1 + 2 * tok + latent
    mel = 2 * latent
    rates = (4, 4, 2, 2, 2, 2)
    t_k, chans, ts = mel, [], []
    for r in rates:
        t_k *= r
        ts.append(t_k)
    chans = [768, 384, 192, 96, 48, 24]
    wav = ts[-1]
    pats = [
        # scope-name hits first (few fusions keep them) ...
        ("vocoder_pallas_stage", r"amp_stage|fused_amp|pallas_stage"),
        ("vocoder_ups", r"ups_\d"),
        ("dit_scan", r"^%?while"),
        ("dit", r"dit|blocks_\d|geglu|conv_ff"),
        ("vae", r"vae\.|autoencoder"),
        ("text", r"bert|t5_|clap|flan"),
        # ... then the derived shape signatures
        ("dit", rf",{seq},|{seq},576|{seq},4608|{seq},2304|{seq},1728"),
        ("vocoder_stage_768", rf"{ts[0]},768|768,{wav}|{batch},768,{ts[0]}"),
        ("vocoder_stage_384", rf"{ts[0] * 2},384|{ts[1]},384"),
        ("vocoder_stage_192", rf"{ts[1]},192|{ts[2]},192"),
        ("vocoder_stage_96", rf"{ts[2]},96|{ts[3]},96"),
        ("vocoder_narrow_or_tail",
         rf"{ts[4]}|{ts[5]}|{ts[3]},48|{ts[4]},24"),
        ("vae", rf"{latent},20|{mel},80|{latent},1536|{mel},768|{latent},768"),
        ("text", rf"{batch},{tok},|{tok},1024|{tok},768|{2 * tok},"),
        ("vocoder_other", r"vocoder|conv_pre|conv_post|act_post|snake"),
    ]
    return pats


STAGE_PATTERNS = build_stage_patterns(BATCH, LATENT, TOK)


def classify(name: str) -> str:
    low = name.lower()
    for stage, pat in STAGE_PATTERNS:
        if re.search(pat, low):
            return stage
    return "other"


def capture() -> str:
    from bench import build_bench_pipeline
    from audiolcm_tpu.aot import load_or_compile

    pipe, clap_ids, t5_ids, knobs = build_bench_pipeline(BATCH, LATENT, TOK)
    rng = jax.random.PRNGKey(0)
    gen_exec, how = load_or_compile(
        "bench_generate", pipe._generate_ids_jit,
        (pipe.params, rng, clap_ids, t5_ids, LATENT),
        extra=("bench",) + knobs + (BATCH, LATENT, TOK),
    )
    print(f"generate program: {how}", file=sys.stderr)
    wav, _ = gen_exec(pipe.params, rng, clap_ids, t5_ids)
    float(jnp.sum(wav))  # warm + completion barrier (axon: no block_until_ready)

    jax.profiler.start_trace(TRACE_DIR)
    wav, _ = gen_exec(pipe.params, jax.random.PRNGKey(1), clap_ids, t5_ids)
    float(jnp.sum(wav))
    jax.profiler.stop_trace()
    # newest xplane.pb under the trace dir
    paths = []
    for root, _dirs, files in os.walk(TRACE_DIR):
        paths += [os.path.join(root, f) for f in files if f.endswith(".xplane.pb")]
    if not paths:
        raise SystemExit("no .xplane.pb produced — device plane not captured?")
    return max(paths, key=os.path.getmtime)


def aggregate(path: str, top_n: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = defaultdict(float)  # name -> total ps
    counts = defaultdict(int)
    for plane in xs.planes:
        pname = plane.name.lower()
        # device planes only: host threads would double-count dispatch
        if not ("tpu" in pname or "device" in pname or "/device" in pname):
            continue
        if "host" in pname:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()} if hasattr(
            plane.event_metadata, "values") else {}
        if not meta:
            meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # Count ONLY the synchronous compute line: the 'XLA Modules'
            # line is the whole-program envelope (double-counts everything
            # inside) and 'Async XLA Ops' are overlapped DMA copies that
            # mostly hide under compute (see tools/xplane_timeline.py for
            # the busy/idle view of those lines).
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1

    total = sum(per_op.values())
    stage_ms = defaultdict(float)
    for name, ms in per_op.items():
        stage_ms[classify(name)] += ms

    print(f"\n== stage totals (device, one b{BATCH} iteration; "
          f"{total:.1f} ms summed) ==")
    for stage, ms in sorted(stage_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {stage:26s} {ms:9.2f} ms  ({100 * ms / max(total, 1e-9):5.1f}%)")
    matched = total - stage_ms.get("other", 0.0)
    if total > 0 and matched / total < 0.7:
        print(f"  WARNING: only {100 * matched / total:.0f}% of device time "
              f"matched a stage pattern — shape signatures were derived for "
              f"batch={BATCH} latent={LATENT} tok={TOK} "
              f"(set AUDIOLCM_PROF_BATCH/LATENT/TOK to match the run)")

    print(f"\n== top {top_n} ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {ms:9.2f} ms x{counts[name]:<4d} [{classify(name):24s}] {name[:110]}")


if __name__ == "__main__":
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    aggregate(capture(), top)
