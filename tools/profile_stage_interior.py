"""Attribute the fused Pallas stage's interior time (round-5 queue #3).

The round-3/4 xplane tables charge 41.4 + 41.3 ms of the 233.5 ms serving
budget to the two fused stages (C=24 / C=48) and note the interior is
"FIR/snake VPU work after the settled tap convs". Mosaic has no intra-kernel
profiler, so this tool attributes the interior by MEASUREMENT DIFFERENCES
over the kernel's public parameters — no package edits, so the serving AOT
fingerprint stays valid:

  1. resblock subsets: time kernel_sizes (3,), (3,7), (3,7,11) — the deltas
     are each resblock's marginal cost (same tile/halo discipline, so the
     halo overhead cancels in the differences).
  2. dilation subsets: (1,) vs (1,3,5) — marginal cost per extra sub-unit
     (each sub-unit = act -> conv(d) -> act -> conv(1)).
  3. act-only microkernel: a tool-local pallas_call running ONLY the
     alias-free snake activation chain (up-FIR -> snake -> down-FIR), same
     tile shape — times the VPU act unit directly. The full stage runs
     2 * n_sub * n_blocks act invocations; act_total = unit * count,
     conv_total ~= full - act_total - (measured dispatch floor).
  4. fast on/off: the fast_cos polynomial vs jnp.cos transcendental delta.

Each variant is its own Mosaic compile of a SINGLE stage (minutes, like
tools/bench_fused_stage.py) — run this in one chip-owning process, after
committing sources, never concurrently with another device workload.

Usage:
  python tools/profile_stage_interior.py            # both serving shapes
  python tools/profile_stage_interior.py 24 159744  # one shape
  AUDIOLCM_INTERIOR_INTERPRET=1 ... (tiny-shape CPU interpret smoke)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from audiolcm_tpu.models.bigvgan import AMPBlock1  # noqa: E402
from audiolcm_tpu.nn.pallas_amp_stage import (  # noqa: E402
    R_ACT,
    extract_stage_params,
    fused_amp_stage_cl_batched,
    valid_alias_free_snake_cl,
)

INTERPRET = os.environ.get("AUDIOLCM_INTERIOR_INTERPRET", "0") == "1"
ITERS = int(os.environ.get("AUDIOLCM_INTERIOR_ITERS", "20"))
# comma-list to run a subset, e.g. "full,act2,act6,accf32" — retrying a
# remote-compile flake shouldn't redo the hour-long exact-cos compile
ONLY = set(filter(None, os.environ.get("AUDIOLCM_INTERIOR_ONLY", "").split(",")))


def _want(key):
    return not ONLY or key in ONLY


def _force(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def timeit(fn, x, iters=ITERS):
    _force(fn(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    _force(out)  # scalar fetch — the only trustworthy barrier on axon
    return (time.perf_counter() - t0) / iters * 1e3


def make_params(c, ks, dil, dtype):
    rng = np.random.default_rng(0)
    mods = [AMPBlock1(k, dil, channels_first=True, fast_snake=True) for k in ks]
    x0 = jnp.zeros((1, c, 256))
    variables = [m.init(jax.random.PRNGKey(i), x0) for i, m in enumerate(mods)]
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype) * 0.1,
        variables)
    params = [v["params"] for v in variables]

    def ref_fn(xb):  # (B, T, C) in/out — boundary-strip reference
        xcf = jnp.transpose(xb, (0, 2, 1))
        ys = [m.apply({"params": p}, xcf) for m, p in zip(mods, params)]
        return jnp.transpose(sum(ys) / len(ys), (0, 2, 1))

    sp = extract_stage_params(params, len(dil))
    sp = jax.tree.map(lambda a: a.astype(dtype), sp)
    return sp, ref_fn


def stage_fn(c, t, tile, ks, dil, fast=True, accum="bf16"):
    dtype = jnp.bfloat16
    sp, ref_fn = make_params(c, ks, dil, dtype)
    return jax.jit(functools.partial(
        fused_amp_stage_cl_batched, stage_params=sp, kernel_sizes=ks,
        dilations=dil, reference_fn=ref_fn, tile=tile, fast=fast,
        accum=accum, interpret=INTERPRET))


def act_only_fn(c, t, tile, n_rep, fast=True):
    """Tool-local pallas_call: n_rep chained alias-free snake activations on
    one (C, tile+halo) block — the same VPU unit the fused stage runs
    2*n_sub*n_blocks times per tile, measured in isolation. n_rep > 1
    amortizes the block DMA so the per-act slope is the unit cost."""
    halo = (n_rep * R_ACT + 127) // 128 * 128

    def kernel(ab_ref, x_hbm, out_ref):
        ib = pl.program_id(0)
        it = pl.program_id(1)

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[ib, :, pl.ds(it * tile, tile + 2 * halo)],
                scratch, sem)
            dma.start()
            dma.wait()
            alpha = ab_ref[0, :]
            beta = ab_ref[1, :]
            xblk = scratch[:]
            for _ in range(n_rep):
                xblk = valid_alias_free_snake_cl(xblk, alpha, beta, fast=fast)
            pad = halo - n_rep * R_ACT  # valid chain leaves tile+2*pad cols
            out_ref[0, :, :] = jax.lax.slice_in_dim(
                xblk, pad, pad + tile, axis=1)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((c, tile + 2 * halo), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    ab = jnp.stack([jnp.zeros((c,), jnp.bfloat16) + 0.3,
                    jnp.ones((c,), jnp.bfloat16)])  # (2, C)

    n_tiles = t // tile

    def run(x):  # (B, T, C)
        b = x.shape[0]
        xcf = jnp.transpose(x, (0, 2, 1))  # (B, C, T)
        xp = jnp.pad(xcf, ((0, 0), (0, 0), (halo, halo)), mode="edge")
        return pl.pallas_call(
            kernel,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # (2, C) alpha/beta
                pl.BlockSpec(memory_space=pl.ANY),      # x in HBM, manual DMA
            ],
            out_specs=pl.BlockSpec((1, c, tile), lambda ib, it: (ib, 0, it),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
            interpret=INTERPRET,
        )(ab, xp)

    return jax.jit(run)


def profile_shape(c, t, tile, b=8):
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), dtype)
    print(f"=== C={c} T={t} tile={tile} b={b} iters={ITERS} ===", flush=True)

    def timed(label, fn, key=None):
        """Time one variant, print immediately (each is a long Mosaic
        compile — a late crash must not lose earlier numbers)."""
        if key is not None and not _want(key):
            return float("nan")
        try:
            ms = timeit(fn, x)
        except Exception as e:  # keep profiling the remaining variants
            print(f"  {label}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
            return float("nan")
        print(f"  {label}: {ms:7.2f} ms", flush=True)
        return ms

    full = timed("full k(3,7,11) d(1,3,5)",
                 stage_fn(c, t, tile, (3, 7, 11), (1, 3, 5)), "full")
    k37 = timed("k(3,7)", stage_fn(c, t, tile, (3, 7), (1, 3, 5)), "k37")
    k3 = timed("k(3)", stage_fn(c, t, tile, (3,), (1, 3, 5)), "k3")
    d1 = timed("dil(1)", stage_fn(c, t, tile, (3, 7, 11), (1,)), "d1")
    slow = timed("exact-cos",
                 stage_fn(c, t, tile, (3, 7, 11), (1, 3, 5), fast=False), "slow")
    # f32 FIR accumulation doubles the FIR VPU work and leaves the snake
    # elementwise in bf16 — its delta over 'full' scales the FIR share
    # (serving numerics knob, so this compiles where the microkernels flake)
    af32 = timed("accum-f32",
                 stage_fn(c, t, tile, (3, 7, 11), (1, 3, 5), accum="f32"),
                 "accf32")
    print(f"  marginal resblock: k7 {k37 - k3:+.2f} ms, k11 {full - k37:+.2f} ms"
          f" | per extra dilation sub-unit {(full - d1) / 2:+.2f} ms"
          f" | fast_cos saves {slow - full:+.2f} ms"
          f" | f32-FIR-accum adds {af32 - full:+.2f} ms")

    # act unit: slope of n_rep=2 vs n_rep=6 (4 extra acts) cancels DMA cost
    a2 = timed("act-only n_rep=2", act_only_fn(c, t, tile, 2), "act2")
    a6 = timed("act-only n_rep=6", act_only_fn(c, t, tile, 6), "act6")
    unit = (a6 - a2) / 4
    n_acts = 2 * 3 * 3  # 2 acts/sub * 3 dil * 3 resblocks
    act_total = unit * n_acts
    print(f"  act-only: n_rep2 {a2:.2f} ms, n_rep6 {a6:.2f} ms -> "
          f"unit {unit:.3f} ms/act; stage runs {n_acts} acts = "
          f"{act_total:.1f} ms act vs {full - act_total:.1f} ms conv+overhead "
          f"(of {full:.1f} full)")
    return full


def serving_tile(c, t):
    """Constant C*tile VMEM/compile budget (C=24 -> 9984, C=48 -> 4992 —
    the benched serving tiles; C=48 at tile 9984 blew a 58-min Mosaic
    compile bound in round 2, so never exceed the budget here)."""
    tile = 239616 // c // 128 * 128
    while tile > 128 and t % tile:
        tile -= 128
    return tile


def main():
    if len(sys.argv) == 3:
        c, t = int(sys.argv[1]), int(sys.argv[2])
        profile_shape(c, t, tile=serving_tile(c, t))
        return
    if INTERPRET:  # CPU smoke at tiny shapes: one stage + one act variant,
        # checking the act kernel against the package's reference math
        c, t, tile, b = 24, 512, 256, 1
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), jnp.bfloat16)
        fn = stage_fn(c, t, tile, (3,), (1,))
        print("stage smoke ok:", fn(x).shape)
        act = act_only_fn(c, t, tile, 2)
        y = act(x)
        # reference: same chain via the package function on a padded block
        halo = (2 * R_ACT + 127) // 128 * 128
        xcf = jnp.pad(jnp.transpose(x[0], (1, 0)),
                      ((0, 0), (halo, halo)), mode="edge")
        a = jnp.zeros((c,), jnp.bfloat16) + 0.3
        bt = jnp.ones((c,), jnp.bfloat16)
        ref = valid_alias_free_snake_cl(
            valid_alias_free_snake_cl(xcf, a, bt), a, bt)
        pad = halo - 2 * R_ACT
        ref = jax.lax.slice_in_dim(ref, pad, pad + t, axis=1)
        d = float(jnp.max(jnp.abs(y[0].astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        print(f"act smoke ok: {y.shape} maxdiff vs reference {d:.3e}")
        # threshold catches alignment bugs (O(1) errors at strip edges);
        # scattered 1-2-ulp bf16 rounding noise (~0.05 on scale 4) is fine
        assert d < 0.2, d
        return
    # the two fused serving stages (b8, 10 s config), serving tiles
    profile_shape(48, 79872, tile=serving_tile(48, 79872))
    profile_shape(24, 159744, tile=serving_tile(24, 159744))


if __name__ == "__main__":
    main()
