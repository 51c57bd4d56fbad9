"""HBM-traffic audit of the XLA (unfused) vocoder stages at C=192/96.

VERDICT r3 'Next round' #5 / NOTES_ROUND4 queue #3: the round-3 stage table
charges 25.3 / 20.7 ms to the C=192 / C=96 stages and calls them
"bandwidth-bound, ~16 ms floor each". This tool checks that claim from the
compiled program itself instead of estimation:

  1. builds ONE production stage (3x AMPBlock1 averaged, kernels 3/7/11,
     dilations 1/3/5) at the stage's true serving shape,
  2. compiles it for the real backend and reports XLA's own cost analysis
     (bytes accessed, flops) plus the optimized-HLO op census (how many
     convolutions/fusions materialize HBM buffers at T and 2T),
  3. times it, and converts bytes/time into achieved GB/s to compare
     against the chip's ~800 GB/s HBM.

If achieved-GB/s is near peak, the 16 ms floor is real and the stage is
done; if it is far below with bytes >> tensor-math minimum, the HLO census
shows which intermediates XLA materializes that a kernel could keep in VMEM.

Usage: python tools/audit_stage_hbm.py [C T] (default: both 192/19968 and
96/39936, b8 bf16, fast_snake on — the benched serving config).
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))

from audiolcm_tpu.models.bigvgan import AMPBlock1  # noqa: E402


def audit(ch: int, t: int, b: int = 8, iters: int = 20):
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, t, ch), dtype)
    blocks = [AMPBlock1(k, (1, 3, 5), fast_snake=True, name=f"rb{k}")
              for k in (3, 7, 11)]
    params = [m.init(jax.random.PRNGKey(i), x[:1])["params"]
              for i, m in enumerate(blocks)]
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    def stage(params, x):
        acc = None
        for m, p in zip(blocks, params):
            h = m.apply({"params": p}, x)
            acc = h if acc is None else acc + h
        return acc / len(blocks)

    fn = jax.jit(stage)
    compiled = fn.lower(params, x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    hlo = compiled.as_text()

    # census of HBM-materializing ops in the optimized HLO entry computation
    convs = len(re.findall(r"= (?:\(.*?\) )?(?:bf16|f32)\[.*?\] convolution", hlo))
    fusions = len(re.findall(r"= (?:\(.*?\) )?(?:bf16|f32|\().*? fusion\(", hlo))
    # buffers of the 2T upsampled size (the alias-free act interior)
    two_t = f"{2 * t}"
    big_bufs = len(re.findall(rf"bf16\[\d+,{two_t},\d+\]", hlo))

    # time it (queued, scalar-fetch barrier — axon rule)
    out = fn(params, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    float(jnp.sum(out))
    ms = (time.perf_counter() - t0) / iters * 1e3

    bytes_acc = ca.get("bytes accessed", 0.0)
    tensor = b * t * ch * 2  # one (B,T,C) bf16 tensor
    print(f"C={ch} T={t}: {ms:.2f} ms/iter | XLA bytes accessed "
          f"{bytes_acc / 1e9:.2f} GB -> {bytes_acc / ms / 1e6:.0f} GB/s "
          f"achieved | flops {ca.get('flops', 0) / 1e9:.1f} G")
    print(f"  tensor size {tensor / 1e6:.1f} MB; bytes/tensor ratio "
          f"{bytes_acc / tensor:.1f} (lower bound ~2 per op in the chain)")
    print(f"  optimized-HLO census: {convs} convolutions, {fusions} fusions, "
          f"{big_bufs} 2T-sized bf16 buffers")
    return ms, bytes_acc


def main():
    if len(sys.argv) == 3:
        audit(int(sys.argv[1]), int(sys.argv[2]))
        return
    audit(192, 19968)
    audit(96, 39936)


if __name__ == "__main__":
    main()
