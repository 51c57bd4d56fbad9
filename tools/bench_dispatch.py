"""Disentangle device compute vs tunnel dispatch overhead.

1. no-op jit over the full vocoder param tree (dispatch cost of many-leaf
   pytrees over the tunneled runtime)
2. chained BigVGAN: out = voc(voc_in) fed back N times INSIDE one jit
   (forces serialized device compute, one dispatch)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig


def main():
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b = 8
    mel = jax.random.normal(rng, (b, 624, 80), dtype)
    voc = BigVGAN(BigVGANConfig())
    pv = jax.tree.map(lambda a: a.astype(dtype), voc.init(rng, mel))
    n_leaves = len(jax.tree.leaves(pv))
    print(f"param leaves: {n_leaves}")

    # 1. no-op dispatch cost
    noop = jax.jit(lambda p, m: m[0, 0, 0])
    out = noop(pv, mel); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = noop(pv, mel)
    jax.block_until_ready(out)
    print(f"no-op dispatch: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms")

    # 2. N serialized vocoder applies inside ONE jit
    def chained(p, m, n):
        def body(carry, _):
            wav = voc.apply(p, m + carry[..., :1, None] * 0)  # data dep on prev
            return wav[:, :1], wav[:, :8]
        carry, outs = jax.lax.scan(body, jnp.zeros((b, 1), dtype), None, length=n)
        return carry

    for n in (1, 4):
        f = jax.jit(lambda p, m: chained(p, m, n))
        out = f(pv, mel); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(pv, mel)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"chained x{n}: {dt*1e3:9.2f} ms total -> {dt/n*1e3:8.2f} ms per vocoder pass")


if __name__ == "__main__":
    main()
