"""A/B the vocoder tail (act_post -> conv_post k7 -> tanh) at C=24, T=160k.

The round-2 stage table lumps this into "upsample+misc ~18 ms". The tail
runs channels-LAST today (models/bigvgan.py:350-355): C=24 on the 128-lane
axis = 19% VPU lane fill for the alias-free snake's FIRs over the longest
stream of the whole net (T=159744). The stage bodies already solved this
with channels-first math (nn/resample_cf.py); this tool asks whether the
tail should follow:

  cl : production path — alias_free_activation_fused + nn.Conv + tanh
  cf : transpose -> alias_free_snake_cf -> conv1d_cf -> tanh (transpose
       included in the timing; the Pallas stage before it outputs cl)

    python tools/bench_post.py [cl|cf|both]

Compiles are pure XLA — minutes. Numerics: both paths' interiors are
bit-identical math (tested in test_resample_cf.py); boundary strips differ
only in composition order, checked here at f32 to ~1e-5.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.resample import alias_free_activation_fused
from audiolcm_tpu.nn.resample_cf import alias_free_snake_cf, conv1d_cf
from audiolcm_tpu.nn.snake import fast_cos


def _force(out):
    return float(jnp.sum(out))


def timeit(fn, *args, iters=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def snake_act(alpha, beta, fast=True):
    cos = fast_cos if fast else jnp.cos

    def act(h):  # channels-last (..., C)
        sin2 = 0.5 * (1.0 - cos(2.0 * alpha * h))
        return h + sin2 * (1.0 / (beta + 1e-9))

    return act


def tail_cl(x, alpha, beta, w, b):
    h = alias_free_activation_fused(x, snake_act(alpha, beta))
    h = jax.lax.conv_general_dilated(
        h, w, (1,), [(3, 3)], dimension_numbers=("NHC", "HIO", "NHC"))
    return jnp.tanh(h + b)[..., 0]


def tail_cf(x, alpha, beta, w, b):
    h = jnp.transpose(x, (0, 2, 1))
    h = alias_free_snake_cf(h, alpha, beta, fast=True)
    h = conv1d_cf(h, w, b, 1)
    return jnp.tanh(h)[:, 0, :]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    dtype = jnp.bfloat16
    b, t, c = 8, 159744, 24
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, t, c), dtype)
    alpha = jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (c,))).astype(dtype)
    beta = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (c,))).astype(dtype)
    w = (jax.random.normal(jax.random.PRNGKey(3), (7, c, 1)) * 0.05).astype(dtype)
    bias = jnp.zeros((1,), dtype)

    results = {}
    if mode in ("cl", "both"):
        ms = timeit(jax.jit(tail_cl), x, alpha, beta, w, bias) * 1e3
        results["cl"] = ms
        print(f"  cl: {ms:8.3f} ms", flush=True)
    if mode in ("cf", "both"):
        ms = timeit(jax.jit(tail_cf), x, alpha, beta, w, bias) * 1e3
        results["cf"] = ms
        print(f"  cf: {ms:8.3f} ms", flush=True)
    if mode == "both":
        # interior numerics check at f32 (excluding each path's own edge rule)
        xf = x[:1, :4096].astype(jnp.float32)
        y1 = tail_cl(xf, alpha.astype(jnp.float32), beta.astype(jnp.float32),
                     w.astype(jnp.float32), bias.astype(jnp.float32))
        y2 = tail_cf(xf, alpha.astype(jnp.float32), beta.astype(jnp.float32),
                     w.astype(jnp.float32), bias.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(y1[:, 16:-16] - y2[:, 16:-16])))
        better = "CF" if results["cf"] < results["cl"] else "cl"
        print(f"verdict: {better} ({results['cl'] / results['cf']:.2f}x, "
              f"delta {results['cl'] - results['cf']:+.2f} ms, "
              f"interior maxdiff {err:.2e})")


if __name__ == "__main__":
    main()
