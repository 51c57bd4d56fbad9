"""Run the full BASELINE.md bench matrix in ONE chip-owning process.

bench.py measures one config per invocation (the driver's contract). The
matrix capture (VERDICT r3 'Next round' #1) wants all five BASELINE configs,
and each fresh process pays a full cold compile — while a single process can
reuse jax's in-process caches (tracing, and any Mosaic kernel-compile reuse
across modules with identical block shapes). This runner calls bench.py's
config functions back-to-back, logging wall time per config, and never
releases the chip between them (operational rule: ONE process owns the
tunneled chip).

Usage: python tools/bench_matrix.py [config ...]   (default: all five)
Output: bench.py's one-JSON-line-per-config on stdout, wall-time notes on
stderr; paste the JSON lines into DESIGN.md's matrix table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (performs backend probe + cache setup on import)

CONFIGS = {
    # BASELINE #3/#4 first: they share the default config's vocoder shapes
    # (b8, mel 624), maximizing in-process reuse after a warm default entry.
    "vae": lambda: bench.bench_vae_roundtrip(),
    "teacher": lambda: bench.bench_teacher(),
    # BASELINE #1: batch-1 single-prompt latency
    "b1_10s": lambda: bench.bench_generate(
        1, 312, "latency_ms_per_clip_2step_lcm_b1", latency=True),
    # BASELINE #5: the 640-mel musiccaps bucket
    "musiccaps": lambda: bench.bench_generate(
        8, 320, "audio_sec_generated_per_sec_per_chip_2step_lcm_b8_musiccaps"),
    # the 20 s / 1248-mel long-form bucket
    "b8_20s": lambda: bench.bench_generate(
        8, 624, "audio_sec_generated_per_sec_per_chip_2step_lcm_b8_20s"),
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        t0 = time.perf_counter()
        print(f"matrix: {name} starting", file=sys.stderr, flush=True)
        try:
            CONFIGS[name]()
        except Exception as e:  # keep the rest of the matrix alive
            print(f"matrix: {name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        print(f"matrix: {name} done in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
