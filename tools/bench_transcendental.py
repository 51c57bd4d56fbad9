"""Is the snake chain really transcendental-bound, and does a range-reduced
polynomial cos beat the builtin?

Times, at the late-stage shape (B=8, C=24/48, T=160k, bf16 and f32):
  * add sweep (VPU roofline anchor)
  * jnp.cos sweep (builtin transcendental)
  * poly_cos sweep (round-based range reduction + even minimax polynomial)
  * the full alias_free_snake_cf with builtin vs poly cos
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, iters=20):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


# cos(x) ~ even minimax polynomial on [-pi, pi] after x -= 2*pi*round(x/2pi).
# Degree-12 even poly (7 coefficients): max abs error ~1.5e-8 on the range.
_COS_COEFS = None


def _fit_coefs():
    global _COS_COEFS
    if _COS_COEFS is None:
        x = np.linspace(-np.pi, np.pi, 20001)
        # least squares on even powers
        powers = np.stack([x ** (2 * k) for k in range(7)], axis=1)
        c, *_ = np.linalg.lstsq(powers, np.cos(x), rcond=None)
        _COS_COEFS = [float(v) for v in c]
    return _COS_COEFS


def poly_cos(x):
    c = _fit_coefs()
    inv2pi = 1.0 / (2.0 * np.pi)
    xf = x.astype(jnp.float32)
    xr = xf - (2.0 * np.pi) * jnp.round(xf * inv2pi)
    u = xr * xr
    acc = c[-1]
    for k in range(len(c) - 2, -1, -1):
        acc = acc * u + c[k]
    return acc.astype(x.dtype)


def main():
    for dtype in (jnp.bfloat16, jnp.float32):
        for c in (24, 48):
            shape = (8, c, 159744)
            x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype) * 5.0

            add = jax.jit(lambda v: v + 1.7)
            cos_b = jax.jit(lambda v: jnp.cos(v))
            cos_p = jax.jit(poly_cos)
            t_add = timeit(add, x)
            t_cos = timeit(cos_b, x)
            t_pol = timeit(cos_p, x)

            # accuracy check
            err = float(jnp.max(jnp.abs(
                poly_cos(x.astype(jnp.float32))
                - jnp.cos(x.astype(jnp.float32)))))
            print(f"dtype={dtype.__name__} C={c}: add {t_add*1e3:.2f} ms  "
                  f"cos {t_cos*1e3:.2f} ms  poly_cos {t_pol*1e3:.2f} ms  "
                  f"poly_err {err:.2e}")

    # full snake chain comparison at the stage-6 shape
    from audiolcm_tpu.nn import resample_cf

    alpha = jnp.ones((24,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 24, 159744),
                          jnp.bfloat16)

    snake = jax.jit(lambda v: resample_cf.alias_free_snake_cf(
        v, alpha, alpha))
    t_builtin = timeit(snake, x)

    snake_fast = jax.jit(lambda v: resample_cf.alias_free_snake_cf(
        v, alpha, alpha, fast=True))
    t_fast = timeit(snake_fast, x)
    print(f"alias_free_snake_cf stage6: builtin {t_builtin*1e3:.2f} ms  "
          f"poly {t_fast*1e3:.2f} ms")


if __name__ == "__main__":
    main()
