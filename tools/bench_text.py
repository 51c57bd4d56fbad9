"""A/B the text towers (CLAP-BERT + T5-large, 77 tokens, b=8) on the real
chip: standard separate q/k/v matmuls vs fuse_proj=True (merged QKV + merged
gated-FF). The towers measured ~13 ms of a 242 ms generate for ~370 GFLOP
(~10x off MXU peak) — small-matmul bound (NOTES_ROUND2 #3).

    python tools/bench_text.py            # both variants
    python tools/bench_text.py fused      # one variant
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

from audiolcm_tpu.models.clap_text import BertConfig, ClapTextEncoder
from audiolcm_tpu.models.t5_encoder import T5Config, T5Encoder


def force(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def zeros_params(model, ids, dtype):
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids))
    host = jax.tree.map(
        lambda s: np.zeros(s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
                           else s.dtype),
        shapes)
    return jax.device_put(host)["params"]


def main():
    variants = [sys.argv[1]] if len(sys.argv) > 1 else ["std", "fused"]
    b, t = 8, 77
    dtype = jnp.bfloat16
    clap_ids = jnp.zeros((b, t), jnp.int32)
    t5_ids = jnp.zeros((b, t), jnp.int32)
    print(f"text towers b={b} tok={t} bf16", flush=True)

    for variant in variants:
        fuse = variant == "fused"
        clap = ClapTextEncoder(BertConfig(), fuse_proj=fuse)
        t5 = T5Encoder(T5Config(), fuse_proj=fuse)
        pc = zeros_params(clap, clap_ids[:1], dtype)
        pt = zeros_params(t5, t5_ids[:1], dtype)

        both = jax.jit(lambda pc, pt: jnp.concatenate(
            [clap.apply({"params": pc}, clap_ids),
             t5.apply({"params": pt}, t5_ids)], axis=1))
        tm = timeit(both, pc, pt)
        print(f"  {variant:5s}: {tm*1e3:7.2f} ms (both towers)", flush=True)


if __name__ == "__main__":
    main()
