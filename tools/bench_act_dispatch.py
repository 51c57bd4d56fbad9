"""A/B the alias-free activation dispatch at the NON-Pallas stage widths.

The `_FUSED_ACT_MAX_CHANNELS = 32` threshold in models/bigvgan.py was
measured BEFORE fast_snake existed (DESIGN.md "2x faster at C<=32" /
"conv path wins at larger widths"): back then the snake's transcendentals
dominated and the depthwise-conv resampling was noise. With fast_snake the
activation cost is the resampling itself, so the verdict may have flipped —
the fused form (4 static-slice 6-tap FIRs, no 2x interleave materialized,
no HIGHEST-precision grouped convs) halves the elementwise traffic.

Benches each production stage (3 resblocks averaged, kernels 3/7/11,
dilations 1/3/5) at the widths the XLA path serves (C=768/384/192/96),
fast_snake on, bf16, b8 10 s shapes:

    python tools/bench_act_dispatch.py [conv|fused|both] [stage_index ...]

Compiles are pure XLA (no Mosaic) — minutes, not hours.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import audiolcm_tpu.models.bigvgan as bigvgan_mod
from audiolcm_tpu.models.bigvgan import AMPBlock1


def _force(out):
    # block_until_ready does not await on the tunneled axon runtime; fetch a
    # scalar to guarantee completion
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def stage_fn(kernel_sizes, fast_snake):
    """Full production stage: average of 3 AMPBlock1s (channels-last)."""

    def apply(params, x):
        acc = None
        for j, rk in enumerate(kernel_sizes):
            amp = AMPBlock1(rk, (1, 3, 5), fast_snake=fast_snake)
            h = amp.apply({"params": params[j]}, x)
            acc = h if acc is None else acc + h
        return acc / len(kernel_sizes)

    return apply


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    picks = [int(a) for a in sys.argv[2:]] or None
    dtype = jnp.bfloat16
    b = 8
    rng = jax.random.PRNGKey(0)
    kernel_sizes = (3, 7, 11)
    # (T, C) of each XLA-path stage input (post-upsample), 10 s clips
    stages = [(2496, 768), (9984, 384), (19968, 192), (39936, 96)]
    if picks is not None:
        stages = [stages[i] for i in picks]

    results = {}
    for variant in ("conv", "fused"):
        if mode not in (variant, "both"):
            continue
        # dispatch threshold: 0 -> always conv path; 9999 -> always fused
        bigvgan_mod._FUSED_ACT_MAX_CHANNELS = 0 if variant == "conv" else 9999
        tot = 0.0
        for t, c in stages:
            x = jax.random.normal(rng, (b, t, c), dtype)
            fn = stage_fn(kernel_sizes, fast_snake=True)
            params = [
                AMPBlock1(rk, (1, 3, 5), fast_snake=True).init(rng, x)["params"]
                for rk in kernel_sizes
            ]
            params = jax.tree.map(lambda a: a.astype(dtype), params)
            ms = timeit(jax.jit(fn), params, x) * 1e3
            tot += ms
            results[(variant, c)] = ms
            print(f"  {variant:5s} C={c:4d} T={t:6d}: {ms:8.2f} ms", flush=True)
        print(f"  {variant:5s} total: {tot:.1f} ms", flush=True)

    if mode == "both":
        print("verdict per width:")
        for t, c in stages:
            cv, fu = results[("conv", c)], results[("fused", c)]
            better = "FUSED" if fu < cv else "conv"
            print(f"  C={c:4d}: conv {cv:7.2f} vs fused {fu:7.2f} -> {better} "
                  f"({cv / fu:.2f}x)")


if __name__ == "__main__":
    main()
