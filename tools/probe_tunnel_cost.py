"""Is device-buffer creation on the tunneled axon runtime bytes-bound or
buffer-count-bound? Times (a) ONE 512 MB zeros output, (b) 600 tiny zeros
outputs (~10 MB total), (c) device_put upload of 64 MB host data.
Decides how (and whether) warm-bench param setup can be made fast."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    leaf = jax.tree.leaves(out)[0]
    s = float(jnp.sum(leaf[..., :1]))
    print(f"{label:36s} {time.perf_counter() - t0:8.2f} s")
    return out


# (a) one big buffer: 256M bf16 = 512 MB
t("one 512MB zeros output", jax.jit(lambda: jnp.zeros((256 * 1024 * 1024,), jnp.bfloat16)))

# (b) many tiny buffers: 600 x (64,128) bf16 ~= 9.8 MB total
many = jax.jit(lambda: [jnp.full((64, 128), i, jnp.bfloat16) for i in range(600)])
t0 = time.perf_counter()
outs = many()
s = sum(float(jnp.sum(o[0, :1])) for o in outs[-1:])
print(f"{'600 tiny outputs (~10MB)':36s} {time.perf_counter() - t0:8.2f} s")

# (c) upload: 32M f16 = 64 MB host -> device
host = np.zeros((32 * 1024 * 1024,), np.float16)
t0 = time.perf_counter()
d = jax.device_put(host)
s = float(jnp.sum(d[:1]))
print(f"{'device_put 64MB upload':36s} {time.perf_counter() - t0:8.2f} s")
