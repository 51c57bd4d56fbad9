"""Re-sweep the vocoder layout thresholds under the fast_snake serving flag.

The channels-first stage threshold (models/bigvgan.py:_CF_STAGE_MAX_CHANNELS)
and the fused-activation width cutoff were tuned with the builtin cos; the
polynomial cos shifts the VPU/layout balance, so the optima may move.

Usage: python tools/bench_cf_sweep.py [fast(1|0)] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, iters=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    fast = (sys.argv[1] == "1") if len(sys.argv) > 1 else True
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (b, 624, 80), dtype) * 0.3

    cfg = BigVGANConfig(fast_snake=fast)
    base = BigVGAN(cfg)
    params = jax.tree.map(lambda a: a.astype(dtype), base.init(rng, mel[:1]))

    audio_s = b * (624 * 256) / 16000
    for cf_max in (0, 24, 48, 96, 192):
        voc = BigVGAN(cfg, cf_max_channels=cf_max)
        fn = jax.jit(lambda p, m: voc.apply(p, m))
        t = timeit(fn, params, mel)
        print(f"fast_snake={fast} cf_max={cf_max:4d}: {t*1e3:8.2f} ms "
              f"({audio_s/t:7.1f}x RT vocoder-only)")


if __name__ == "__main__":
    main()
