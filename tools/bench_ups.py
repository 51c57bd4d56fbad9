"""Transposed-conv (upsample) formulations A/B on the attached device.

The 6 BigVGAN upsample convs run as lhs-dilated convs today
(`models/bigvgan.py:ConvTranspose1dTorchParity`). If XLA computes the
dilated input densely, 1-1/u of the MACs multiply structural zeros
(4x waste at u=4). A polyphase decomposition computes each output phase
r = s mod u as a small dense conv over the UNDILATED input and interleaves:

  out[n*u + r] = sum_i x[n + base_r + i] @ w[q0(r) + i*u],
  q0(r) = (p - r) % u, base_r = (r - p + q0)/u, p = k-1-crop.

Variants:
  - lhsdil: the current production formulation
  - poly: u separate small convs + phase interleave (minimal FLOPs)
  - polyfused: ONE conv with u*C_out output channels (phases share a
    common tap window, zero-padded taps where bases differ) — trades up
    to (m'+?)/m FLOPs for a single wide MXU conv + one reshape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _force(out):
    return float(jnp.sum(out))


def timeit(fn, *args, iters=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


CHAIN = int(os.environ.get("CHAIN", "24"))


def timeit_chained(fn, x, w, iters=3):
    """Per-op timing with the ~3 ms tunnel dispatch floor amortized away:
    CHAIN data-dependent applications inside ONE jit (a scalar from iter i
    perturbs iter i+1's input, so XLA can neither DCE nor reorder them)."""

    def chained(x, w):
        def body(carry, _):
            out = fn(x * (1.0 + carry * 1e-30), w)
            return out[0, 0, 0].astype(x.dtype) * 1e-30, ()
        carry, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=CHAIN)
        return carry

    j = jax.jit(chained)
    _force(j(x, w))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = j(x, w)
    _force(out)
    return (time.perf_counter() - t0) / (iters * CHAIN)


def lhsdil(x, kernel, u):
    k = kernel.shape[0]
    crop = (k - u) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (1,), [(k - 1 - crop, k - 1 - crop)], lhs_dilation=(u,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _phase_plan(k, u):
    p = k - 1 - (k - u) // 2
    plan = []
    for r in range(u):
        q0 = (p - r) % u
        m = (k - q0 + u - 1) // u
        base = (r - p + q0) // u
        plan.append((q0, m, base))
    return plan


def poly(x, kernel, u):
    k, cin, cout = kernel.shape
    t = x.shape[1]
    plan = _phase_plan(k, u)
    pad_l = max(0, -min(b for _, _, b in plan))
    pad_r = max(0, max(b + m - 1 for _, m, b in plan))
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    outs = []
    for q0, m, base in plan:
        wr = kernel[q0::u][:m]
        sl = jax.lax.slice_in_dim(xp, base + pad_l, base + pad_l + t + m - 1, axis=1)
        outs.append(jax.lax.conv_general_dilated(
            sl, wr, (1,), [(0, 0)], dimension_numbers=("NHC", "HIO", "NHC")))
    out = jnp.stack(outs, axis=2)  # (B, T, u, Cout)
    return out.reshape(x.shape[0], t * u, cout)


def polyfused(x, kernel, u):
    k, cin, cout = kernel.shape
    t = x.shape[1]
    plan = _phase_plan(k, u)
    base_min = min(b for _, _, b in plan)
    m_all = max(b + m for _, m, b in plan) - base_min
    pad_l = max(0, -base_min)
    pad_r = max(0, base_min + m_all - 1)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    # one (m_all, Cin, u*Cout) kernel; phase r occupies out cols [r*cout:...]
    wf = jnp.zeros((m_all, cin, u * cout), kernel.dtype)
    for r, (q0, m, base) in enumerate(plan):
        off = base - base_min
        wf = wf.at[off:off + m, :, r * cout:(r + 1) * cout].set(kernel[q0::u][:m])
    sl = jax.lax.slice_in_dim(xp, base_min + pad_l, base_min + pad_l + t + m_all - 1, axis=1)
    out = jax.lax.conv_general_dilated(
        sl, wf, (1,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"))  # (B, T, u*Cout)
    return out.reshape(x.shape[0], t * u, cout)


def main():
    rng = jax.random.PRNGKey(0)
    # correctness (f32, small)
    for (k, u) in ((8, 4), (4, 2)):
        x = jax.random.normal(rng, (2, 37, 16), jnp.float32)
        w = jax.random.normal(rng, (k, 16, 24), jnp.float32)
        ref = lhsdil(x, w, u)
        for name, fn in (("poly", poly), ("polyfused", polyfused)):
            got = fn(x, w, u)
            err = float(jnp.max(jnp.abs(got - ref)))
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            print(f"k={k} u={u} {name}: maxerr {err:.2e}")
            assert err < 1e-5, (name, err)

    dtype = jnp.bfloat16
    b = 8
    # (T_in, C_in, C_out, k, u) for the 6 ups convs at 10 s shapes
    stages = [
        (624, 1536, 768, 8, 4),
        (2496, 768, 384, 8, 4),
        (9984, 384, 192, 4, 2),
        (19968, 192, 96, 4, 2),
        (39936, 96, 48, 4, 2),
        (79872, 48, 24, 4, 2),
    ]
    totals = {"lhsdil": 0.0, "poly": 0.0, "polyfused": 0.0}
    for t, cin, cout, k, u in stages:
        x = jax.random.normal(rng, (b, t, cin), dtype)
        w = jax.random.normal(rng, (k, cin, cout), dtype)
        row = f"T={t:6d} {cin:4d}->{cout:4d} k{k} u{u}:"
        for name, fn in (("lhsdil", lhsdil), ("poly", poly), ("polyfused", polyfused)):
            dt = timeit_chained(lambda x, w, fn=fn: fn(x, w, u), x, w)
            totals[name] += dt
            row += f"  {name} {dt*1e3:7.2f}"
        print(row + " ms", flush=True)
    print("totals: " + "  ".join(f"{n} {v*1e3:.1f} ms" for n, v in totals.items()))


if __name__ == "__main__":
    main()
