"""Composition-level benchmarks: transposed convs, full AMP blocks, and
whole BigVGAN stages, to localize the end-to-end cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import AMPBlock1, ConvTranspose1dTorchParity


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
    b = 8
    rng = jax.random.PRNGKey(0)
    # (T_in, C_in, C_out, k, u) per upsample stage
    stages = [
        (624, 1536, 768, 8, 4),
        (2496, 768, 384, 8, 4),
        (9984, 384, 192, 4, 2),
        (19968, 192, 96, 4, 2),
        (39936, 96, 48, 4, 2),
        (79872, 48, 24, 4, 2),
    ]
    tot_ups = tot_amp = 0.0
    for t_in, cin, cout, k, u in stages:
        x = jax.random.normal(rng, (b, t_in, cin), dtype)
        ups = ConvTranspose1dTorchParity(cout, k, u)
        p_ups = ups.init(rng, x)
        t_ups = timeit(jax.jit(lambda p, x: ups.apply(p, x)), p_ups, x)

        y = jax.random.normal(rng, (b, t_in * u, cout), dtype)
        amp = AMPBlock1(11, (1, 3, 5))
        p_amp = amp.init(rng, y)
        t_amp = timeit(jax.jit(lambda p, y: amp.apply(p, y)), p_amp, y)

        tot_ups += t_ups
        tot_amp += 3 * t_amp  # 3 parallel AMP blocks per stage (k=3,7,11 similar)
        print(f"T_in={t_in:6d} {cin:4d}->{cout:4d}: convT {t_ups*1e3:8.2f} ms | "
              f"AMPBlock(k11) {t_amp*1e3:8.2f} ms (x3={3*t_amp*1e3:8.2f})")
    print(f"totals: convT {tot_ups*1e3:.1f} ms, AMP {tot_amp*1e3:.1f} ms")


if __name__ == "__main__":
    main()
