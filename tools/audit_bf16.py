"""Audit the bf16 serving graph for f32-promotion leaks.

Traces the production generate program on CPU (no device needed) and lists
the largest f32 intermediates in the jaxpr. Expected f32: the LCM scan
state/schedule math, softmax internals, GroupNorm/LayerNorm statistics, and
conv accumulators that are immediately cast back. A LARGE f32 tensor that
flows onward (like the pre-fix DiT sequence, dit.py round 2) is a leak.

Usage: JAX_PLATFORMS=cpu python tools/audit_bf16.py [top_n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    # Pallas stage kernels can't trace on CPU without interpret mode; audit
    # the XLA path (STAGE_MAX=0) — the fused stages are bf16 by construction.
    os.environ["AUDIOLCM_PALLAS_STAGE_MAX"] = "0"
    from bench import build_bench_pipeline

    pipe, clap_ids, t5_ids, _ = build_bench_pipeline()
    rng = jax.random.PRNGKey(0)
    jaxpr = jax.make_jaxpr(
        lambda p, r, a, b: pipe._generate_from_ids(p, r, a, b, 312)
    )(pipe.params, rng, clap_ids, t5_ids)

    sizes = []

    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is None or not hasattr(aval, "dtype"):
                    continue
                if aval.dtype == jnp.float32 and aval.size >= 1 << 20:
                    sizes.append((aval.size, str(aval.shape), str(eqn.primitive)))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                if isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
    sizes.sort(reverse=True)
    print(f"f32 intermediates >= 1M elements: {len(sizes)}")
    seen = set()
    shown = 0
    for size, shape, prim in sizes:
        key = (shape, prim)
        if key in seen:
            continue
        seen.add(key)
        print(f"  {size / 1e6:8.1f}M  {shape:24s} {prim}")
        shown += 1
        if shown >= top_n:
            break


if __name__ == "__main__":
    main()
