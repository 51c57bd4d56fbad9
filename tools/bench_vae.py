"""Probe the VAE decoder's ~14 ms (round-2 stage table) at production shape.

decode: z (8, 312, 20) -> mel (8, 624, 80). FLOP census (b8): ~450 GFLOP
of k3/k5 convs at C=384..1536 -> 2.3 ms at v5e bf16 peak, so 14 ms is
~16% MXU util. This tool times the decoder standalone plus ablations to
locate the slack:

  decode     full decoder, bf16 (the production path)
  noattn     mid attention replaced by identity (isolates the T=312 attn)
  matmul     the same conv FLOPs as plain matmuls (the XLA-conv overhead
             bound: what the decoder could cost if convs hit matmul rate)

    python tools/bench_vae.py [decode|noattn|matmul|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import audiolcm_tpu.models.vae1d as vae_mod
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, iters=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def decoder_matmul_census(cfg: VAEConfig, t_lat: int, b: int):
    """(M, K, N) of every decoder conv as an implicit GEMM."""
    ch = cfg.ch
    mults = list(cfg.ch_mult)
    block_in = ch * mults[-1]
    t = t_lat
    shapes = [(b * t, 20, block_in * 0 + 20)]  # post_quant 1x1 (tiny)
    shapes.append((b * t, cfg.kernel_size * 20, block_in))  # conv_in
    for _ in range(2):  # mid blocks
        shapes += [(b * t, 3 * block_in, block_in)] * 2
    up_layers = [i + 1 for i in cfg.down_layers]
    cur = block_in
    for i_level in reversed(range(len(mults))):
        block_out = ch * mults[i_level]
        for _ in range(cfg.num_res_blocks + 1):
            shapes += [(b * t, 3 * cur, block_out), (b * t, 3 * block_out, block_out)]
            if cur != block_out:
                shapes.append((b * t, cur, block_out))  # nin_shortcut 1x1
            cur = block_out
        if i_level in up_layers:
            t *= 2
            shapes.append((b * t, 3 * cur, cur))  # upsample conv
    shapes.append((b * t, cfg.kernel_size * cur, cfg.out_ch))  # conv_out
    return shapes


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    dtype = jnp.bfloat16
    b, t_lat = 8, 312
    cfg = VAEConfig()
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (b, t_lat, cfg.embed_dim), dtype)

    model = AutoencoderKL1D(cfg)
    variables = jax.eval_shape(
        lambda: model.init(rng, jnp.zeros((1, 16, 80)), rng))
    import numpy as np

    rs = np.random.default_rng(0)
    params = jax.device_put(jax.tree.map(
        lambda s: (rs.standard_normal(s.shape) * 0.02).astype(dtype),
        variables["params"]))

    def decode(p, zz):
        return model.apply({"params": p}, zz, method=model.decode)

    if mode in ("decode", "all"):
        ms = timeit(jax.jit(decode), params, z) * 1e3
        print(f"  decode: {ms:8.3f} ms", flush=True)
    if mode in ("noattn", "all"):
        orig = vae_mod.AttnBlock1D.__call__
        vae_mod.AttnBlock1D.__call__ = lambda self, x: x
        try:
            # params no longer match the attn-free module tree; re-init shape
            noattn_params = jax.device_put(jax.tree.map(
                lambda s: (rs.standard_normal(s.shape) * 0.02).astype(dtype),
                jax.eval_shape(lambda: model.init(
                    rng, jnp.zeros((1, 16, 80)), rng))["params"]))
            ms = timeit(jax.jit(decode), noattn_params, z) * 1e3
            print(f"  noattn: {ms:8.3f} ms", flush=True)
        finally:
            vae_mod.AttnBlock1D.__call__ = orig
    if mode in ("matmul", "all"):
        census = decoder_matmul_census(cfg, t_lat, b)
        gflop = sum(2 * m * k * n for m, k, n in census) / 1e9
        mats = [(jax.random.normal(rng, (m, k), dtype),
                 jax.random.normal(rng, (k, n), dtype)) for m, k, n in census]

        def allmm(ms_):
            return sum(jnp.sum(a @ bb) for a, bb in ms_)

        ms = timeit(jax.jit(allmm), mats) * 1e3
        print(f"  matmul: {ms:8.3f} ms for the same {gflop:.0f} GFLOP "
              f"({gflop / ms:.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
