"""A/B the fused-stage conv formulations on the real chip: "tap" (round-1
per-tap dots, the shipped default) vs "mstack" (one M-stacked dot + shifted
adds; see nn/pallas_amp_stage.py:valid_conv_cl_mstack).

Measures the PRODUCTION kernel variant (fused_amp_stage_cl_batched, the one
BigVGAN._pallas_stage dispatches) at the vocoder's real serving shapes.
One shape per invocation so each Mosaic compile (~10-15 min cold) is an
explicit budgeted step:

    python tools/bench_mstack.py 24          # C=24, T=159744 (both modes)
    python tools/bench_mstack.py 48          # C=48, T=79872
    python tools/bench_mstack.py 24 mstack   # only one mode
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

from audiolcm_tpu.models.bigvgan import AMPBlock1, _pick_stage_tile
from audiolcm_tpu.nn.pallas_amp_stage import (
    extract_stage_params,
    fused_amp_stage_cl_batched,
)

KS = (3, 7, 11)
DIL = (1, 3, 5)
SHAPES = {24: 159744, 48: 79872, 96: 39936}


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def make_stage(c, fast=True):
    rng = np.random.default_rng(0)
    mods = [AMPBlock1(k, DIL, channels_first=True, fast_snake=fast) for k in KS]
    x0 = jnp.zeros((1, c, 256))
    variables = [m.init(jax.random.PRNGKey(i), x0) for i, m in enumerate(mods)]
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables)
    params = [v["params"] for v in variables]

    def ref_fn(xb):  # (B, T, C) in/out — the XLA padded path
        xcf = jnp.transpose(xb, (0, 2, 1))
        ys = [m.apply({"params": p}, xcf) for m, p in zip(mods, params)]
        return jnp.transpose(sum(ys) / len(ys), (0, 2, 1))

    return params, ref_fn


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    modes = [sys.argv[2]] if len(sys.argv) > 2 else ["tap", "mstack"]
    t = SHAPES[c]
    tile = _pick_stage_tile(t)
    dtype = jnp.bfloat16
    fast = True
    print(f"C={c} T={t} tile={tile} b=8 dtype=bf16 fast_snake={fast}",
          flush=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (8, t, c), dtype)
    params, ref_fn = make_stage(c, fast=fast)
    sp = extract_stage_params(params, len(DIL))
    sp = jax.tree.map(lambda a: a.astype(dtype), sp)

    xla = jax.jit(ref_fn)
    t_xla = timeit(xla, x)
    print(f"  xla ref: {t_xla*1e3:8.2f} ms", flush=True)
    y_ref = xla(x).astype(jnp.float32)
    scale = float(jnp.std(y_ref))

    for conv in modes:
        fn = jax.jit(lambda v, _conv=conv: fused_amp_stage_cl_batched(
            v, sp, KS, DIL, reference_fn=ref_fn, tile=tile, fast=fast,
            conv=_conv))
        t0 = time.perf_counter()
        try:
            tm = timeit(fn, x)
        except Exception as e:
            print(f"  {conv}: FAILED after {time.perf_counter()-t0:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        compile_s = time.perf_counter() - t0 - 10 * tm
        d = float(jnp.max(jnp.abs(fn(x).astype(jnp.float32) - y_ref)))
        print(f"  {conv}: {tm*1e3:8.2f} ms  (compile ~{compile_s:.0f}s, "
              f"maxdiff {d:.3e} = {d/scale:.2%} of std)", flush=True)


if __name__ == "__main__":
    main()
