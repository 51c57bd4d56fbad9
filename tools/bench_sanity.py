"""Sanity check: same timing harness on one AMP block vs full BigVGAN."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import AMPBlock1, BigVGAN, BigVGANConfig


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


def main():
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b = 8

    y = jax.random.normal(rng, (b, 159744, 24), dtype)
    amp = AMPBlock1(11, (1, 3, 5))
    p = jax.tree.map(lambda a: a.astype(dtype), amp.init(rng, y))
    f = jax.jit(lambda p, y: amp.apply(p, y))
    for iters in (3, 20):
        print(f"AMPBlock T=160k C=24 iters={iters}: {timeit(f, p, y, iters=iters)*1e3:.3f} ms")

    mel = jax.random.normal(rng, (b, 624, 80), dtype)
    voc = BigVGAN(BigVGANConfig())
    pv = jax.tree.map(lambda a: a.astype(dtype), voc.init(rng, mel))
    fv = jax.jit(lambda p, m: voc.apply(p, m))
    print(f"full BigVGAN: {timeit(fv, pv, mel, iters=5)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
