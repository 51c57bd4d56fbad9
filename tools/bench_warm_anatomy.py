"""Phase timing of a warm AOT bench run: where does the wall-clock go?

Phases: python imports, pipeline build (zeros params on device + cast),
AOT pickle read, deserialize_and_load (ships the binary to the device),
first execution, steady-state execution.
"""

import os
import pickle
import time

t0 = time.perf_counter()


def mark(label, t_prev):
    t = time.perf_counter()
    print(f"{label:28s} {t - t_prev:8.2f} s")
    return t


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp  # noqa: E402

t = mark("import jax", t0)
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_bench_pipeline  # noqa: E402

t = mark("import bench/pkg", t)

pipe, clap_ids, t5_ids, knobs = build_bench_pipeline()
t = mark("build pipeline (params)", t)

# force the params to exist on device before timing the load
s = float(jnp.sum(jax.tree.leaves(pipe.params.dit)[0]))
t = mark("force params resident", t)

from audiolcm_tpu import aot  # noqa: E402

key = aot.source_fingerprint(("bench",) + knobs + (8, 312, 77))
path = os.path.join(aot.cache_dir(), f"bench_generate-{key}.pkl")
print("artifact:", path, os.path.exists(path))
with open(path, "rb") as f:
    ser, in_tree, out_tree, n_exec = pickle.load(f)
t = mark("pickle read+parse", t)

from jax.experimental import serialize_executable as se  # noqa: E402

loaded = se.deserialize_and_load(ser, in_tree, out_tree,
                                 execution_devices=jax.devices()[:n_exec])
t = mark("deserialize_and_load", t)

rng = jax.random.PRNGKey(0)
wav, _ = loaded(pipe.params, rng, clap_ids, t5_ids)
s = float(jnp.sum(wav))
t = mark("first exec + fetch", t)

start = time.perf_counter()
for i in range(5):
    wav, _ = loaded(pipe.params, jax.random.PRNGKey(i), clap_ids, t5_ids)
s = float(jnp.sum(wav))
t = mark("5 iters", t)
print(f"{'TOTAL':28s} {time.perf_counter() - t0:8.2f} s")
