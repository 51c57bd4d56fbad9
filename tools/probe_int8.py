"""Does int8 x int8 -> int32 dot_general hit the MXU's 2x int8 path on this
chip, and what does dynamic quantization cost? Times the stage-1 vocoder
conv shape (positions = 8*2496, C=768, k=11 folded into the contraction)
in bf16 vs int8, plus the quantize/dequantize overhead.

Decides VERDICT round-1 item #9 (int8 weights for the wide stages).
"""

import time

import jax
import jax.numpy as jnp


def force(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    m, k, n = 8 * 2496, 11 * 768, 768  # stage-1 conv as implicit GEMM
    a = jax.random.normal(rng, (m, k), jnp.bfloat16)
    b = jax.random.normal(rng, (k, n), jnp.bfloat16)

    bf16_dot = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    ai = (jax.random.normal(rng, (m, k)) * 10).astype(jnp.int8)
    bi = (jax.random.normal(rng, (k, n)) * 10).astype(jnp.int8)
    int8_dot = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))

    # full dynamic-quant pipeline: quantize act per-tensor, weight already
    # int8 (per-out-channel scales), dequant in the epilogue
    wscale = jnp.ones((n,), jnp.float32) * 0.05

    def q_dot(a_bf16, bi, wscale):
        amax = jnp.max(jnp.abs(a_bf16.astype(jnp.float32)))
        ascale = amax / 127.0
        aq = jnp.clip(jnp.round(a_bf16.astype(jnp.float32) / ascale), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, bi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (ascale * wscale)).astype(jnp.bfloat16)

    q_dot_j = jax.jit(q_dot)

    t_bf16 = timeit(bf16_dot, a, b)
    t_int8 = timeit(int8_dot, ai, bi)
    t_q = timeit(q_dot_j, a, bi, wscale)
    fl = 2 * m * k * n
    print(f"bf16 dot      {t_bf16 * 1e3:7.3f} ms  {fl / t_bf16 / 1e12:6.1f} TFLOP/s")
    print(f"int8 dot      {t_int8 * 1e3:7.3f} ms  {fl / t_int8 / 1e12:6.1f} TOP/s")
    print(f"dynq+dot+deq  {t_q * 1e3:7.3f} ms  {fl / t_q / 1e12:6.1f} eff TOP/s")


if __name__ == "__main__":
    main()
