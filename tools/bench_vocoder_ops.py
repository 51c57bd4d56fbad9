"""Microbenchmarks of BigVGAN's constituent ops on the attached device.

Breaks the 6 upsample stages into their primitive costs (dilated convs,
alias-free activations, transposed convs) to find where the ~540 ms goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.resample import alias_free_activation
from audiolcm_tpu.nn.snake import snake_beta


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


def conv1d(x, w, dilation=1):
    pad = (w.shape[0] * dilation - dilation) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def main():
    dtype = jnp.bfloat16
    b = 8
    stages = [
        (2496, 768), (9984, 384), (19968, 192),
        (39936, 96), (79872, 48), (159744, 24),
    ]
    total_conv = total_act = 0.0
    for t, c in stages:
        x = jnp.zeros((b, t, c), dtype)
        w = jnp.zeros((11, c, c), dtype)
        alpha = jnp.ones((c,), dtype)

        t_conv = timeit(jax.jit(lambda x, w: conv1d(x, w, 5)), x, w)
        act = jax.jit(lambda x, a: alias_free_activation(x, lambda h: snake_beta(h, a, a)))
        t_act = timeit(act, x, alpha)
        # per stage: 18 convs + 18 acts (3 blocks x 3 sub x (2 convs, 2 acts))
        stage_conv, stage_act = 18 * t_conv, 18 * t_act
        total_conv += stage_conv
        total_act += stage_act
        print(f"T={t:6d} C={c:4d}: conv11_d5 {t_conv*1e3:7.2f} ms x18={stage_conv*1e3:8.1f} | "
              f"aliasfree-act {t_act*1e3:7.2f} ms x18={stage_act*1e3:8.1f}")
    print(f"estimated totals: convs {total_conv*1e3:.0f} ms, acts {total_act*1e3:.0f} ms")


if __name__ == "__main__":
    main()
