"""A/B the wide vocoder stages (C=768 T=2496, C=384 T=9984) on the real
chip: bf16 XLA resblock convs vs the dynamic-int8 path
(nn/int8_conv.py, BigVGAN.int8_min_channels). Measures the production
composition — 3 AMPBlock1s (k 3/7/11, d 1/3/5) averaged, channels-last,
fast_snake, b=8 — per stage.

Decides VERDICT r2 #3: keep int8 only if it wins >=5% end-to-end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.bigvgan import AMPBlock1

KS = (3, 7, 11)
DIL = (1, 3, 5)
STAGES = [(768, 2496), (384, 9984)]


def force(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main():
    b = 8
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    for c, t in STAGES:
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), dtype)
        results = {}
        y = {}
        for int8 in (False, True):
            mods = [AMPBlock1(k, DIL, fast_snake=True, int8_convs=int8)
                    for k in KS]
            x0 = jnp.zeros((1, 256, c))
            variables = [m.init(jax.random.PRNGKey(i), x0)
                         for i, m in enumerate(mods)]
            variables = jax.tree.map(
                lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype)
                * 0.1, variables)

            def stage(vs, xb, _mods=mods):
                return sum(m.apply(v, xb) for m, v in zip(_mods, vs)) / len(_mods)

            fn = jax.jit(stage)
            results[int8] = timeit(fn, variables, x)
            y[int8] = fn(variables, x).astype(jnp.float32)
        d = float(jnp.max(jnp.abs(y[True] - y[False])))
        scale = float(jnp.std(y[False]))
        print(f"C={c:4d} T={t:6d}: bf16 {results[False]*1e3:7.2f} ms  "
              f"int8 {results[True]*1e3:7.2f} ms  "
              f"({results[False]/results[True]:.2f}x, maxdiff {d:.3e} "
              f"= {d/scale:.2%} of std)", flush=True)


if __name__ == "__main__":
    main()
