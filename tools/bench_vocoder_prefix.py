"""Honest BigVGAN stage costs: time cumulative prefixes of the stack
(conv_pre, +stage1, ..., full); differences = per-stage costs. Each timing
forces a scalar fetch (block_until_ready lies on the tunneled runtime)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.models.bigvgan import (
    AMPBlock1,
    BigVGANConfig,
    ConvTranspose1dTorchParity,
    _conv1d,
)


class BigVGANPrefix(nn.Module):
    """Mirrors BigVGAN.__call__'s stage dispatch (cf layout + fast_snake)."""

    config: BigVGANConfig
    num_stages: int
    cf_max_channels: int = 48

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        x = _conv1d(cfg.upsample_initial_channel, 7, name="conv_pre")(mel)
        nk = len(cfg.resblock_kernel_sizes)
        for i in range(self.num_stages):
            u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dTorchParity(ch, k, u, name=f"ups_{i}")(x)
            cf = ch <= self.cf_max_channels
            if cf:
                x = jnp.transpose(x, (0, 2, 1))
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                h = AMPBlock1(rk, tuple(rd), channels_first=cf,
                              fast_snake=cfg.fast_snake,
                              name=f"resblock_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / nk
            if cf:
                x = jnp.transpose(x, (0, 2, 1))
        return x


def force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=5):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main():
    dtype = jnp.bfloat16
    b = 8
    fast = os.environ.get("AUDIOLCM_FAST_SNAKE", "1") == "1"
    cfg = BigVGANConfig(fast_snake=fast)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (b, 624, 80), dtype)
    prev = 0.0
    for n in range(0, 7):
        model = BigVGANPrefix(cfg, n)
        params = jax.tree.map(lambda a: a.astype(dtype), model.init(rng, mel))
        t = timeit(jax.jit(lambda p, m: model.apply(p, m)), params, mel)
        print(f"prefix stages={n}: {t*1e3:8.2f} ms  (stage delta {max(0, t - prev)*1e3:7.2f} ms)")
        prev = t


if __name__ == "__main__":
    main()
