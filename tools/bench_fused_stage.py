"""A/B: XLA AMP stage vs Pallas fused stage (per-batch loop vs 2D grid)
at the vocoder's dominant late-stage shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.bigvgan import AMPBlock1
from audiolcm_tpu.nn.pallas_amp_stage import (
    extract_stage_params,
    fused_amp_stage_cl,
    fused_amp_stage_cl_batched,
)

KS = (3, 7, 11)
DIL = (1, 3, 5)


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, iters=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def make_stage(c, channels_first, fast=False):
    rng = np.random.default_rng(0)
    mods = [AMPBlock1(k, DIL, channels_first=channels_first, fast_snake=fast)
            for k in KS]
    x0 = jnp.zeros((1, 256, c)) if not channels_first else jnp.zeros((1, c, 256))
    variables = [m.init(jax.random.PRNGKey(i), x0) for i, m in enumerate(mods)]
    # randomize so snakes aren't degenerate
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables)
    params = [v["params"] for v in variables]

    def ref_fn(xb):  # (B, T, C) in/out
        if channels_first:
            xcf = jnp.transpose(xb, (0, 2, 1))
            ys = [m.apply({"params": p}, xcf) for m, p in zip(mods, params)]
            return jnp.transpose(sum(ys) / len(ys), (0, 2, 1))
        ys = [m.apply({"params": p}, xb) for m, p in zip(mods, params)]
        return sum(ys) / len(ys)

    return params, ref_fn


def main():
    import sys as _sys

    fast = (_sys.argv[1] == "1") if len(_sys.argv) > 1 else True
    dtype = jnp.bfloat16
    for c, t, tile in ((48, 79872, 9984), (24, 159744, 9984)):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, t, c), dtype)
        params, ref_fn = make_stage(c, channels_first=True, fast=fast)
        sp = extract_stage_params(params, len(DIL))
        sp = jax.tree.map(lambda a: a.astype(dtype), sp)

        xla = jax.jit(ref_fn)
        loop = jax.jit(lambda v: fused_amp_stage_cl(
            v, sp, KS, DIL, reference_fn=ref_fn, tile=tile, fast=fast))
        grid = jax.jit(lambda v: fused_amp_stage_cl_batched(
            v, sp, KS, DIL, reference_fn=ref_fn, tile=tile, fast=fast))

        t_xla = timeit(xla, x)
        t_loop = timeit(loop, x)
        t_grid = timeit(grid, x)
        # correctness spot-check of the 2D-grid variant vs XLA
        d = float(jnp.max(jnp.abs(grid(x).astype(jnp.float32)
                                  - xla(x).astype(jnp.float32))))
        print(f"C={c} T={t}: xla {t_xla*1e3:7.2f} ms | pallas-loop "
              f"{t_loop*1e3:7.2f} ms | pallas-2dgrid {t_grid*1e3:7.2f} ms | "
              f"maxdiff {d:.3e}")


if __name__ == "__main__":
    main()
