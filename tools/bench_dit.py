"""A/B the DiT backbone with and without fused Q/K/V projections.

The round-2 stage table puts the DiT at ~39 ms of the 242 ms b8 generate
(2-step scan, CFG batch-doubled -> two b16 forwards). Its 8 attention
modules each run 3 separate (576, 576) dots at a few hundred tokens —
small-matmul/dispatch bound, the same regime where the text towers' fused
projections measured 1.31x (DESIGN.md round-3 verdicts). fuse_qkv merges
them into one (576, 1728) dot per module (numerics-preserving,
tests/test_dit_fuse.py).

Benches ONE CFG-doubled production forward (b16, latent 312, ctx 154,
bf16, flash attention), variants:

    python tools/bench_dit.py [std|fused|noflash|both|all|ab]

ab = std -> noflash -> std again in ONE process (drift-checked A/B; the
tunnel's external timings fluctuate run-to-run, so cross-process numbers
are only trustworthy to ~10%).

noflash swaps the Pallas flash kernel for the XLA einsum attention — at
seq 467 / head_dim 72 the flash kernel's d-axis fills 72/128 lanes, while
the einsum path materializes the (16,8,467,467) logits through HBM; which
loss is larger is an empirical question.

Compiles are pure XLA + the already-cached flash kernel — minutes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.nn.attention import fuse_attention_params


def _force(out):
    # block_until_ready does not await on the tunneled axon runtime
    return float(jnp.sum(out))


def timeit(fn, *args, iters=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    dtype = jnp.bfloat16
    # defaults: CFG batch-doubled b8 at the 10 s bucket. The long-bucket
    # flash retune (VERDICT r3 #7) overrides latent via env: at mel 1248
    # the latent is 624 -> DiT seq 779.
    b = int(os.environ.get("AUDIOLCM_DIT_BATCH", "16"))
    latent_len = int(os.environ.get("AUDIOLCM_DIT_LATENT", "312"))
    ctx_len = 154
    print(f"shapes: b={b} latent={latent_len} ctx={ctx_len} "
          f"(seq {latent_len + ctx_len + 1})", flush=True)
    rng = jax.random.PRNGKey(0)
    on_tpu = jax.default_backend() == "tpu"

    x = jax.random.normal(rng, (b, latent_len, 20), dtype)
    t = jnp.full((b,), 499, jnp.int32)
    ctx = jax.random.normal(rng, (b, ctx_len, 1024), dtype)
    w = jax.random.normal(rng, (b, 256), dtype)

    std = ConcatDiT2MLP(use_flash=on_tpu)
    params = std.init(rng, x[:1], t[:1], ctx[:1], w[:1])["params"]
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    if mode == "ab":
        fn_std = jax.jit(lambda p, *a: std.apply({"params": p}, *a))
        nof = ConcatDiT2MLP(use_flash=False)
        fn_nof = jax.jit(lambda p, *a: nof.apply({"params": p}, *a))
        s1 = timeit(fn_std, params, x, t, ctx, w) * 1e3
        n1 = timeit(fn_nof, params, x, t, ctx, w) * 1e3
        s2 = timeit(fn_std, params, x, t, ctx, w) * 1e3
        print(f"  flash  : {s1:8.3f} / {s2:8.3f} ms (drift "
              f"{abs(s2 - s1) / s1 * 100:.1f}%)")
        print(f"  noflash: {n1:8.3f} ms")
        s = min(s1, s2)
        better = "NOFLASH" if n1 < s else "flash"
        print(f"verdict: {better} ({s / n1:.3f}x, 2-step delta "
              f"~{2 * (s - n1):.2f} ms)")
        return

    results = {}
    if mode in ("std", "both", "all"):
        fn = jax.jit(lambda p, *a: std.apply({"params": p}, *a))
        ms = timeit(fn, params, x, t, ctx, w) * 1e3
        results["std"] = ms
        print(f"  std    : {ms:8.3f} ms per CFG-doubled forward", flush=True)
    if mode in ("noflash", "all"):
        nof = ConcatDiT2MLP(use_flash=False)
        fn = jax.jit(lambda p, *a: nof.apply({"params": p}, *a))
        ms = timeit(fn, params, x, t, ctx, w) * 1e3
        results["noflash"] = ms
        print(f"  noflash: {ms:8.3f} ms per CFG-doubled forward", flush=True)
    if mode in ("fused", "both"):
        fused = ConcatDiT2MLP(use_flash=on_tpu, fuse_qkv=True)
        fparams = fuse_attention_params(params)
        fn = jax.jit(lambda p, *a: fused.apply({"params": p}, *a))
        ms = timeit(fn, fparams, x, t, ctx, w) * 1e3
        results["fused"] = ms
        print(f"  fused: {ms:8.3f} ms per CFG-doubled forward", flush=True)
    if mode == "both":
        better = "FUSED" if results["fused"] < results["std"] else "std"
        print(f"verdict: {better} ({results['std'] / results['fused']:.3f}x, "
              f"2-step delta ~{2 * (results['std'] - results['fused']):.2f} ms)")


if __name__ == "__main__":
    main()
