"""A/B the batch-1 overlap-discard fold (nn/fold.py, BigVGAN.fold_t_segments).

Round-5 b1 xplane attribution (DESIGN.md): the four wide XLA vocoder stages
run 4.6-7.6x their b8 per-clip cost at B=1 (XLA puts the size-1 batch on the
sublane axis; ~70-130 GB/s effective). The fold runs each XLA stage as a
`fold`-segment batch with exact overlap-discard stitching. This tool times
the full BigVGAN at the production b1 shape (T_mel=624, bf16, fast_snake)
for fold in {0, 4, 8, 16} with the Pallas stages OFF, so every variant is an
XLA-only compile (minutes, not the fused stages' tens of minutes) and the
delta isolates exactly the stages the fold touches. The C<=48 stages run the
channels-first XLA path in all variants (they fold too).

Usage: python tools/bench_b1_fold.py [fold ...]   (default: 0 4 8 16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig


def force(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    folds = [int(a) for a in sys.argv[1:]] or [0, 4, 8, 16]
    iters = int(os.environ.get("AUDIOLCM_BENCH_ITERS", "20"))
    t_mel = int(os.environ.get("AUDIOLCM_B1_TMEL", "624"))
    dtype = jnp.bfloat16
    fast = os.environ.get("AUDIOLCM_FAST_SNAKE", "1") == "1"
    cfg = BigVGANConfig(fast_snake=fast)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, t_mel, 80), dtype)
    base = BigVGAN(cfg)
    params = jax.tree.map(lambda a: a.astype(dtype),
                          base.init(jax.random.PRNGKey(1), mel))
    ref = None
    for fold in folds:
        model = BigVGAN(cfg, fold_t_segments=fold)
        fn = jax.jit(lambda p, m: model.apply(p, m))
        t0 = time.perf_counter()
        out = fn(params, mel)
        force(out)
        compile_s = time.perf_counter() - t0
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"  fold={fold}: max |diff| vs fold=0 = {err:.3e}")
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            force(fn(params, mel))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(f"fold={fold:3d}: median {med*1e3:8.2f} ms  "
              f"best {times[0]*1e3:8.2f} ms  (compile {compile_s:.0f} s, "
              f"iters {iters}, T_mel {t_mel}, fast_snake {fast})")


if __name__ == "__main__":
    main()
