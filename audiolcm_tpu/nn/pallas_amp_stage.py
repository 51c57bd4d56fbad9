"""Fused AMP-stage compute for BigVGAN's narrow (late) stages.

The last upsample stages (C=24..48, T up to 160k) dominate vocoder wall
clock: dozens of memory-bound ops each traversing ~60 MB of HBM with <1/4
lane utilization. The fix is to compute an ENTIRE stage — 3 resblocks x
3 sub-blocks of (alias-free snake -> dilated conv -> alias-free snake ->
conv) with residuals and the 3-block average — per tile in VMEM, reading
and writing HBM exactly once.

Structure (each layer is tested against the one above):
  1. `valid_*` ops: padding-free (shrinking) versions of the stage's ops
     on (L, C) arrays — equal to the padded ops away from boundaries.
  2. `stage_valid`: the whole stage composed from valid ops; for an input
     slice x[t0-R : t0+L+R] it returns exactly stage(x)[t0 : t0+L] for any
     interior window (R = stage receptive radius).
  3. `fused_amp_stage`: Pallas kernel tiling `stage_valid` over T with halo
     DMA, plus XLA-path boundary strips stitched on (the reference's
     per-op padding rules only matter within R of the sequence ends).

Parity: bit-comparable to models.bigvgan.AMPBlock1 composition (tested in
tests/test_pallas_amp_stage.py).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiolcm_tpu.nn.resample import kaiser_sinc_filter1d

# receptive radius of the alias-free activation in input samples
R_ACT = 6


def _exact_cos(h: jnp.ndarray) -> jnp.ndarray:
    """Builtin cos with an f32 round-trip: Mosaic cannot legalize math.cos
    on bf16 vectors (found on-chip in round 5 — the fast=False kernel knob
    never actually compiled before), and the TPU transcendental unit is f32
    anyway, matching the XLA path's compute-f32/store-bf16 rounding."""
    return jnp.cos(h.astype(jnp.float32)).astype(h.dtype)


def _act_taps():
    up = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64) * 2.0
    up_even = [float(up[15 - 2 * d]) for d in range(2, 8)]
    up_odd = [float(up[16 - 2 * d]) for d in range(3, 9)]
    down = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    fe = [float(v) for v in down[0::2]]
    fo = [float(v) for v in down[1::2]]
    return up_even, up_odd, fe, fo


UP_EVEN, UP_ODD, DOWN_E, DOWN_O = _act_taps()


# Fused-stage numerics knob (threaded from BigVGAN.pallas_stage_accum):
#   "bf16" (default) — accumulate FIR taps and the resblock average in the
#     stream dtype. Fastest (round-1 kernel, 313.9x end-to-end); bf16-vs-f32
#     mean error 0.28% of output scale vs the XLA path's 0.09% from per-tap
#     rounding in the FIRs.
#   "f32" — accumulate each FIR and the resblock average in f32, rounding to
#     the stream dtype at the SAME points the XLA path does (after each FIR
#     conv; snake elementwise stays bf16). Error lands at/below the XLA
#     path's; measured cost on the tunneled v5e was far above the 5% budget
#     (earlier f32-interior variants: 312 -> 212x end-to-end), so it is the
#     accuracy knob, not the default. DESIGN.md "Fused-stage numerics".


def _corr(x: jnp.ndarray, taps, start: int, out_len: int,
          acc_dtype=None) -> jnp.ndarray:
    """12-tap FIR as shifted adds. acc_dtype=float32 accumulates in f32 and
    returns f32 (caller rounds); None accumulates in the stream dtype."""
    acc = None
    for d, w in enumerate(taps):
        sl = jax.lax.slice_in_dim(x, start + d, start + d + out_len, axis=0)
        if acc_dtype is not None:
            sl = sl.astype(acc_dtype)
        acc = w * sl if acc is None else acc + w * sl
    return acc


def valid_alias_free_snake(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                           fast: bool = False, accum: str = "bf16") -> jnp.ndarray:
    """(L, C) -> (L - 2*R_ACT, C); out[t] == padded_op(x)[t + R_ACT] for
    interior windows. alpha/beta already exponentiated (linear scale)."""
    from audiolcm_tpu.nn.snake import fast_cos

    cos = fast_cos if fast else _exact_cos
    l = x.shape[0]
    out_len = l - 2 * R_ACT
    ad = jnp.float32 if accum == "f32" else None
    # up phases for j in [3, l-3): ue[j] = sum_d x[j-3+d]*UP_EVEN[d],
    #                              uo[j] = sum_d x[j-2+d]*UP_ODD[d]
    n_u = l - 6
    ue = _corr(x, UP_EVEN, 0, n_u, ad)
    uo = _corr(x, UP_ODD, 1, n_u, ad)
    if ad is not None:
        # round after the up-FIR — the same rounding point as the XLA
        # depthwise up-conv; the snake elementwise stays in the stream dtype
        ue = ue.astype(x.dtype)
        uo = uo.astype(x.dtype)
    sin2 = lambda h: 0.5 * (1.0 - cos(2.0 * alpha * h))
    ae = ue + sin2(ue) / (beta + 1e-9)
    ao = uo + sin2(uo) / (beta + 1e-9)
    # y[t] = sum_j DOWN_E[j]*ao[t+j-3] + DOWN_O[j]*ae[t+j-2], t in [6, l-6)
    # array coords (arrays start at j=3): ao_arr[t-6+j], ae_arr[t-5+j]... in
    # out coords s = t-6: ao_arr[s+j], ae_arr[s+j+1]
    y = _corr(ao, DOWN_E, 0, out_len, ad)
    y = y + _corr(ae, DOWN_O, 1, out_len, ad)
    return y.astype(x.dtype) if ad is not None else y


def valid_conv(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """(L, C_in) x (k, C_in, C_out) -> (L - (k-1)*d, C_out): valid conv as
    k tap-wise matmuls (MXU), accumulate in f32."""
    k = w.shape[0]
    out_len = x.shape[0] - (k - 1) * dilation
    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(x, j * dilation, j * dilation + out_len, axis=0)
        # bf16 multiplies on the MXU, f32 accumulation (both accum modes:
        # the MXU accumulator is free)
        term = jax.lax.dot_general(
            sl, w[j], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc = term if acc is None else acc + term
    return (acc + bias).astype(x.dtype)


def _center(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    off = (x.shape[0] - out_len) // 2
    return jax.lax.slice_in_dim(x, off, off + out_len, axis=0)


def subblock_radius(k: int, dilation: int) -> int:
    return R_ACT + (k - 1) * dilation // 2 + R_ACT + (k - 1) // 2


def stage_radius(kernel_sizes: Sequence[int], dilations: Sequence[int]) -> int:
    """Max receptive radius over the parallel resblocks."""
    return max(
        sum(subblock_radius(k, d) for d in dilations) for k in kernel_sizes
    )


def stage_valid(x: jnp.ndarray, stage_params: List[dict],
                kernel_sizes: Sequence[int], dilations: Sequence[int],
                fast: bool = False, accum: str = "bf16") -> jnp.ndarray:
    """(L, C) -> (L - 2*R, C): the full stage with valid semantics.

    stage_params[b] = {"sub": [ {a1, b1, w1, c1b, a2, b2, w2, c2b} x len(dilations) ]}
    matching models.bigvgan.AMPBlock1 (weights in (k, C_in, C_out) layout,
    snake alphas already exponentiated).
    """
    r_total = stage_radius(kernel_sizes, dilations)
    out_len = x.shape[0] - 2 * r_total
    # residual adds stay in the stream dtype (matching the XLA path's
    # rounding); accum="f32" also lifts the cross-resblock average to f32
    acc = None
    for bi, k in enumerate(kernel_sizes):
        h_res = x
        for si, d in enumerate(dilations):
            p = stage_params[bi]["sub"][si]
            h = valid_alias_free_snake(h_res, p["a1"], p["b1"], fast, accum)
            h = valid_conv(h, p["w1"], p["c1b"], d)
            h = valid_alias_free_snake(h, p["a2"], p["b2"], fast, accum)
            h = valid_conv(h, p["w2"], p["c2b"], 1)
            h_res = _center(h_res, h.shape[0]) + h
        contrib = _center(h_res, out_len)
        if accum == "f32":
            contrib = contrib.astype(jnp.float32)
        acc = contrib if acc is None else acc + contrib
    return acc / len(kernel_sizes)


def extract_stage_params(amp_params: List[dict], num_sub: int, logscale: bool = True):
    """flax AMPBlock1 param dicts -> stage_params with exponentiated snakes.

    amp_params[b] = the params dict of resblock b (act1_i/act2_i/conv1_i/conv2_i).
    """
    out = []
    exp = jnp.exp if logscale else (lambda v: v)
    for bp in amp_params:
        subs = []
        for i in range(num_sub):
            subs.append({
                "a1": exp(bp[f"act1_{i}"]["alpha"]),
                "b1": exp(bp[f"act1_{i}"]["beta"]),
                "w1": bp[f"conv1_{i}"]["kernel"],
                "c1b": bp[f"conv1_{i}"]["bias"],
                "a2": exp(bp[f"act2_{i}"]["alpha"]),
                "b2": exp(bp[f"act2_{i}"]["beta"]),
                "w2": bp[f"conv2_{i}"]["kernel"],
                "c2b": bp[f"conv2_{i}"]["bias"],
            })
        out.append({"sub": subs})
    return out


# ---------------------------------------------------------------------------
# (C, L) transposed-layout ops: time on the 128-lane axis
#
# With C=24..48 minormost, every vreg wastes >3/4 of its lanes; transposing
# so L is minormost gives full-lane elementwise throughput (the transposes
# happen ONCE outside the kernel). Weights are passed pre-transposed as
# (k, C_out, C_in).
# ---------------------------------------------------------------------------


def _corr_cl(x: jnp.ndarray, taps, start: int, out_len: int,
             acc_dtype=None) -> jnp.ndarray:
    # see _corr: acc_dtype=float32 -> f32 accumulation, returns f32
    acc = None
    for d, w in enumerate(taps):
        sl = jax.lax.slice_in_dim(x, start + d, start + d + out_len, axis=1)
        if acc_dtype is not None:
            sl = sl.astype(acc_dtype)
        acc = w * sl if acc is None else acc + w * sl
    return acc


def valid_alias_free_snake_cl(x: jnp.ndarray, alpha, beta,
                              fast: bool = False,
                              accum: str = "bf16") -> jnp.ndarray:
    """(C, L) -> (C, L - 2*R_ACT); alpha/beta (C,)."""
    from audiolcm_tpu.nn.snake import fast_cos

    cos = fast_cos if fast else _exact_cos
    l = x.shape[1]
    out_len = l - 2 * R_ACT
    ad = jnp.float32 if accum == "f32" else None
    n_u = l - 6
    ue = _corr_cl(x, UP_EVEN, 0, n_u, ad)
    uo = _corr_cl(x, UP_ODD, 1, n_u, ad)
    if ad is not None:
        # round after the up-FIR (XLA's rounding point); snake stays bf16
        ue = ue.astype(x.dtype)
        uo = uo.astype(x.dtype)
    a = alpha[:, None]
    binv = 1.0 / (beta + 1e-9)
    sin2 = lambda h: 0.5 * (1.0 - cos(2.0 * a * h))
    ae = ue + sin2(ue) * binv[:, None]
    ao = uo + sin2(uo) * binv[:, None]
    y = _corr_cl(ao, DOWN_E, 0, out_len, ad)
    y = y + _corr_cl(ae, DOWN_O, 1, out_len, ad)
    return y.astype(x.dtype) if ad is not None else y


def valid_conv_cl_tap(x: jnp.ndarray, wt: jnp.ndarray, bias: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """(C_in, L) x wt (k, C_out, C_in) -> (C_out, L - (k-1)*d): k per-tap
    dots, f32 accumulation. The proven-compiling round-1 formulation."""
    k = wt.shape[0]
    out_len = x.shape[1] - (k - 1) * dilation
    acc = None
    for j in range(k):
        sl = jax.lax.slice_in_dim(x, j * dilation, j * dilation + out_len, axis=1)
        # bf16 multiplies on the MXU, f32 accumulation (see valid_conv)
        term = jax.lax.dot_general(
            wt[j], sl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc = term if acc is None else acc + term
    return (acc + bias[:, None]).astype(x.dtype)


def valid_conv_cl_mstack(x: jnp.ndarray, wm: jnp.ndarray, bias: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """(C_in, L) x wm (k*C_out, C_in) -> (C_out, L - (k-1)*d).

    wm is the tap-stacked-along-M weight: wm[j*C_out + co, ci] = w[j, ci, co]
    (see stack_conv_weight_m). ONE dot computes every tap's partial output
    (k*C_out, L); the conv result is then k shifted adds over sub-row blocks
    — the same slice+add pattern the FIR `_corr_cl` compiles today.

    Why: per-tap dots at the narrow stages run at K=M=C, filling
    (C/128)^2 = 3.5-14% of the MXU; xplane showed the convs dominating the
    fused C=24 kernel (~27 of 41 ms). M-stacking keeps K=C (still the
    under-filled axis) but amortizes ALL taps into one pipelined dot:
    utilization rises to C/128 (18.75% at C=24, 37.5% at C=48), ~5x fewer
    MXU stalls, with NO relayout: a K-stacked formulation (concat of
    shifted slices) needs offset-normalizing stores that Mosaic either
    rejects (`tpu.concatenate` offset mismatch) or compiles for >2 h.
    Numerics: per-tap partials accumulate in f32 exactly as before (the dot
    emits f32; the adds stay f32), one bf16 materialization per conv."""
    cin = x.shape[0]
    cout = cin  # AMP resblock convs are channel-preserving
    k = wm.shape[0] // cout
    out_len = x.shape[1] - (k - 1) * dilation
    # (k*C_out, L) f32: all taps' partial outputs in one MXU pass
    out_all = jax.lax.dot_general(
        wm, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc = None
    for j in range(k):
        sl = jax.lax.slice(
            out_all,
            (j * cout, j * dilation),
            (j * cout + cout, j * dilation + out_len),
        )
        acc = sl if acc is None else acc + sl
    return (acc + bias[:, None]).astype(x.dtype)


def stack_conv_weight_m(w: jnp.ndarray) -> jnp.ndarray:
    """(k, C_in, C_out) module-layout conv weight -> (k*C_out, C_in) stacked
    along M for valid_conv_cl (tap-major rows to match its sub-row blocks)."""
    k, cin, cout = w.shape
    return jnp.transpose(w, (0, 2, 1)).reshape(k * cout, cin)


def _roll_lanes(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """pltpu.roll along the lane axis for any dtype. Mosaic only implements
    rotates for 32-bit data ("Rotate with non-32-bit data"), so 16-bit
    arrays round-trip through f32 — bit-exact, since no arithmetic happens,
    and a handful of VPU converts per conv (~us) against the MXU win."""
    if x.dtype == jnp.float32:
        return pltpu.roll(x, shift, axis=1)
    return pltpu.roll(x.astype(jnp.float32), shift, axis=1).astype(x.dtype)


def valid_conv_cl_kstack(x: jnp.ndarray, wk: jnp.ndarray, bias: jnp.ndarray,
                         dilation: int) -> jnp.ndarray:
    """(Cp, Lw) x wk (Cp, k*Cp) -> (Cp, Lw - (k-1)*d): the conv as ONE dot
    with K = k*Cp instead of k dots with K = C.

    Why: at the narrow stages the per-tap dots run at K = M = C, filling a
    few % of the MXU (xplane round 2: ~27 of 41 ms in the C=24 stage kernel).
    K is the MXU's accumulation-depth axis, so K-stacking the taps raises
    utilization ~k-fold on that axis while M stays C. Round 2's attempt at
    this died on HOW the (k*C, L) operand gets built: a concat of shifted
    slices needs offset-normalizing relayouts that Mosaic either rejects
    (`tpu.concatenate` lane-offset mismatch) or compiles for >2 h. The fix:
    k-1 lane-ROTATES (pltpu.roll) normalize every block's offset to zero,
    and padding C to the 16-row sublane tile (Cp) makes the stack/reshape
    tile-aligned — both relayout-free. The rotate's wrapped tail columns are
    never read (out_len <= Lw - j*d), and the Cp padding is free on the VPU
    (a 24-row bf16 array already occupies 32 physical rows per vreg tile).

    wk[co, j*Cp + ci] = w[j, ci, co], zero where Cp pads past C (see
    stack_conv_weight_k) — so padded rows/cols contribute exact zeros.
    Numerics: identical contraction terms to the tap path, one f32
    accumulation in the MXU, the same single bf16 rounding point.
    """
    cp, lw = x.shape
    k = wk.shape[1] // cp
    out_len = lw - (k - 1) * dilation
    rows = [x]
    for j in range(1, k):
        rows.append(_roll_lanes(x, (-j * dilation) % lw))
    st = jnp.stack(rows, axis=0).reshape(k * cp, lw)
    out_all = jax.lax.dot_general(
        wk, st, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc = jax.lax.slice(out_all, (0, 0), (cp, out_len))
    return (acc + bias[:, None]).astype(x.dtype)


def stack_conv_weight_k(w: jnp.ndarray, cp: int) -> jnp.ndarray:
    """(k, C_in, C_out) module-layout conv weight -> (Cp, k*Cp) K-stacked
    weight for valid_conv_cl_kstack; rows/cols beyond C are zero."""
    k, cin, cout = w.shape
    wt = jnp.transpose(w, (0, 2, 1))  # (k, cout, cin)
    if cp != cin or cp != cout:
        wt = jnp.pad(wt, ((0, 0), (0, cp - cout), (0, cp - cin)))
    return jnp.transpose(wt, (1, 0, 2)).reshape(cp, k * cp)


def pad_channels(v: jnp.ndarray, cp: int, value: float) -> jnp.ndarray:
    """Pad a per-channel vector (C,) to (Cp,) with a neutral value."""
    c = v.shape[0]
    if cp == c:
        return v
    return jnp.pad(v, (0, cp - c), constant_values=jnp.asarray(value, v.dtype))


def _center_cl(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    off = (x.shape[1] - out_len) // 2
    return jax.lax.slice_in_dim(x, off, off + out_len, axis=1)


def stage_valid_cl(x: jnp.ndarray, stage_params: List[dict],
                   kernel_sizes: Sequence[int], dilations: Sequence[int],
                   fast: bool = False, accum: str = "bf16",
                   conv: str = "tap") -> jnp.ndarray:
    """(C, L) layout stage_valid; stage_params weights under 'w1t'/'w2t' are
    (k, C_out, C_in) for conv="tap", M-stacked (k*C_out, C_in) for
    conv="mstack", or K-stacked (Cp, k*Cp) for conv="kstack" (in which case
    x and every per-channel param arrive padded to Cp — see
    valid_conv_cl_kstack; kstack only traces inside a Pallas kernel because
    it uses pltpu.roll)."""
    conv_fn = {"tap": valid_conv_cl_tap, "mstack": valid_conv_cl_mstack,
               "kstack": valid_conv_cl_kstack}[conv]
    r_total = stage_radius(kernel_sizes, dilations)
    out_len = x.shape[1] - 2 * r_total
    # residual adds in the stream dtype; accum="f32" lifts the cross-resblock
    # average to f32 (see stage_valid)
    acc = None
    for bi, k in enumerate(kernel_sizes):
        h_res = x
        for si, d in enumerate(dilations):
            p = stage_params[bi]["sub"][si]
            h = valid_alias_free_snake_cl(h_res, p["a1"], p["b1"], fast, accum)
            h = conv_fn(h, p["w1t"], p["c1b"], d)
            h = valid_alias_free_snake_cl(h, p["a2"], p["b2"], fast, accum)
            h = conv_fn(h, p["w2t"], p["c2b"], 1)
            h_res = _center_cl(h_res, h.shape[1]) + h
        contrib = _center_cl(h_res, out_len)
        if accum == "f32":
            contrib = contrib.astype(jnp.float32)
        acc = contrib if acc is None else acc + contrib
    return acc / len(kernel_sizes)


# ---------------------------------------------------------------------------
# Pallas tiling
# ---------------------------------------------------------------------------


def _compiler_params(n_grid_dims: int, accum: str, conv: str = "tap"):
    """accum="f32" only: raise the per-kernel scoped-VMEM limit — the in-op
    f32 accumulators (FIR taps / resblock average) push transient VMEM past
    the 16M default at the larger C*tile blocks (an all-f32 variant measured
    18.55M at C=48/tile=4992); physical VMEM is 128MiB and this kernel
    hand-manages its only DMA, so granting it headroom is safe. Grid dims
    are fully parallel (independent tiles). The bf16 path compiles with
    Mosaic defaults (the round-1 configuration the 313.9x number was
    measured under)."""
    if accum != "f32" and conv == "tap":
        # Mosaic defaults (the round-1 bf16/per-tap configuration)
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * n_grid_dims,
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _stitch_boundaries(out, x, reference_fn, strip: int, r: int):
    """Overwrite the sequence-edge strips of the fused kernel's output with
    the unfused padded path (reference_fn).

    Why: the kernel computes valid math over a once-zero-padded input, while
    the reference zero-pads at EVERY conv/FIR — the two differ only within
    r samples of each sequence end. `strip` (= the lane-aligned halo) is
    overwritten so edge samples stay bit-identical to the module path.

    Round-4 strip audit (VERDICT r3 #4): padded-op outputs at positions
    < N - r of an N-sample window equal the full-sequence outputs, so a
    window of strip + r samples (lane-aligned) is sufficient — the round-1
    stitch used strip + 2r + 128 — and the left/right windows batch into
    ONE reference_fn call, halving the unfused small-op dispatch count.
    """
    b, t, _ = x.shape
    n = min(-(-(strip + r) // 128) * 128, t)  # lane-aligned minimal window
    lr = jnp.concatenate([x[:, :n, :], x[:, t - n:, :]], axis=0)
    y = reference_fn(lr)
    out = out.at[:, :strip, :].set(y[:b, :strip, :].astype(out.dtype))
    out = out.at[:, -strip:, :].set(y[b:, n - strip:, :].astype(out.dtype))
    return out


def _fallback(reference_fn, x, t, tile):
    """Untileable length -> the padded reference path, with a clear error for
    standalone callers that passed no reference_fn (ADVICE round 1)."""
    if reference_fn is None:
        raise ValueError(
            f"fused AMP stage needs T divisible by tile with >= 2 tiles "
            f"(T={t}, tile={tile}) and no reference_fn was given to fall "
            f"back to; pass reference_fn or pick a tile via _pick_stage_tile"
        )
    return reference_fn(x)


def fused_amp_stage(
    x: jnp.ndarray,  # (B, T, C)
    stage_params: List[dict],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int],
    reference_fn=None,  # (B, L, C) -> (B, L, C): padded-path fn for boundary strips
    tile: int = 16384,
    interpret: bool = False,
    fast: bool = False,
    accum: str = "bf16",  # fused-stage numerics knob (see module top)
) -> jnp.ndarray:
    """Tile `stage_valid` over T with halo DMA; stitch boundary strips from
    `reference_fn` (the unfused module) so sequence-edge padding semantics
    match exactly."""
    b, t, c = x.shape
    r = stage_radius(kernel_sizes, dilations)
    halo = (r + 127) // 128 * 128  # lane-aligned halo
    if t % tile != 0 or t < 2 * tile:
        # fallback entirely to the reference path for awkward lengths
        return _fallback(reference_fn, x, t, tile)

    # flatten params in a fixed order for the kernel arg list
    flat: List[jnp.ndarray] = []
    for bi in range(len(kernel_sizes)):
        for si in range(len(dilations)):
            p = stage_params[bi]["sub"][si]
            for key in ("a1", "b1", "c1b", "a2", "b2", "c2b"):
                flat.append(jnp.asarray(p[key])[None, :])  # (1, C)
            flat.append(jnp.asarray(p["w1"]))  # (k, C, C)
            flat.append(jnp.asarray(p["w2"]))

    n_sub = len(dilations)

    def kernel(x_hbm, *refs):
        out_ref = refs[-1]
        prefs = refs[:-1]
        i = pl.program_id(0)

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tile, tile + 2 * halo), :], scratch, sem
            )
            cp.start()
            cp.wait()
            xblk = scratch[:]

            # rebuild stage_params views from refs
            params = []
            idx = 0
            for bi in range(len(kernel_sizes)):
                subs = []
                for si in range(n_sub):
                    a1, b1, c1b, a2, b2, c2b = (prefs[idx + j][0, :] for j in range(6))
                    w1 = prefs[idx + 6][:]
                    w2 = prefs[idx + 7][:]
                    idx += 8
                    subs.append({"a1": a1, "b1": b1, "c1b": c1b, "a2": a2,
                                 "b2": b2, "c2b": c2b, "w1": w1, "w2": w2})
                params.append({"sub": subs})
            y = stage_valid(xblk, params, kernel_sizes, dilations, fast, accum)
            out_ref[:, :] = _center(y, tile).astype(out_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((tile + 2 * halo, c), x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    def run_one(x1):  # (T, C)
        xp = jnp.pad(x1, ((halo, halo), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(t // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
            out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
            compiler_params=_compiler_params(1, accum),
            interpret=interpret,
        )(xp, *flat)

    out = jnp.stack([run_one(x[i]) for i in range(b)])

    if reference_fn is not None:
        out = _stitch_boundaries(out, x, reference_fn, halo, r)
    return out


def fused_amp_stage_cl(
    x: jnp.ndarray,  # (B, T, C)
    stage_params: List[dict],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int],
    reference_fn=None,
    tile: int = 16384,
    interpret: bool = False,
    fast: bool = False,
    accum: str = "bf16",  # fused-stage numerics knob (see module top)
    conv: str = "tap",  # "tap" (round-1 per-tap dots) | "mstack" (one-dot M-stack)
) -> jnp.ndarray:
    """Transposed-layout fused stage: compute happens on (C, L) tiles so
    time rides the full 128-lane axis (C=24 minormost wastes >3/4 lanes).
    The (B,T,C)<->(B,C,T) transposes happen once in XLA outside the kernel.
    """
    if conv == "kstack":
        raise ValueError("conv='kstack' needs the Cp-padded plumbing of "
                         "fused_amp_stage_cl_batched (the production path)")
    b, t, c = x.shape
    r = stage_radius(kernel_sizes, dilations)
    halo = (r + 127) // 128 * 128
    if t % tile != 0 or t < 2 * tile:
        return _fallback(reference_fn, x, t, tile)

    n_sub = len(dilations)
    flat: List[jnp.ndarray] = []
    for bi in range(len(kernel_sizes)):
        for si in range(n_sub):
            p = stage_params[bi]["sub"][si]
            for key in ("a1", "b1", "c1b", "a2", "b2", "c2b"):
                flat.append(jnp.asarray(p[key])[:, None])  # (C, 1)
            if conv == "mstack":
                # (k*C_out, C_in) M-stacked layout for the one-dot conv
                flat.append(stack_conv_weight_m(jnp.asarray(p["w1"])))
                flat.append(stack_conv_weight_m(jnp.asarray(p["w2"])))
            else:
                # (k, C_in, C_out) -> (k, C_out, C_in) per-tap layout
                flat.append(jnp.transpose(jnp.asarray(p["w1"]), (0, 2, 1)))
                flat.append(jnp.transpose(jnp.asarray(p["w2"]), (0, 2, 1)))

    def kernel(x_hbm, *refs):
        out_ref = refs[-1]
        prefs = refs[:-1]
        i = pl.program_id(0)

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(i * tile, tile + 2 * halo)], scratch, sem
            )
            cp.start()
            cp.wait()
            xblk = scratch[:]

            params = []
            idx = 0
            for bi in range(len(kernel_sizes)):
                subs = []
                for si in range(n_sub):
                    a1, b1, c1b, a2, b2, c2b = (prefs[idx + j][:, 0] for j in range(6))
                    w1t = prefs[idx + 6][:]
                    w2t = prefs[idx + 7][:]
                    idx += 8
                    subs.append({"a1": a1, "b1": b1, "c1b": c1b, "a2": a2,
                                 "b2": b2, "c2b": c2b, "w1t": w1t, "w2t": w2t})
                params.append({"sub": subs})
            y = stage_valid_cl(xblk, params, kernel_sizes, dilations, fast,
                               accum, conv)
            out_ref[:, :] = _center_cl(y, tile).astype(out_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((c, tile + 2 * halo), x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    def run_one(x1_ct):  # (C, T)
        xp = jnp.pad(x1_ct, ((0, 0), (halo, halo)))
        return pl.pallas_call(
            kernel,
            grid=(t // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
            out_specs=pl.BlockSpec((c, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, t), x.dtype),
            compiler_params=_compiler_params(1, accum, conv),
            interpret=interpret,
        )(xp, *flat)

    x_ct = jnp.transpose(x, (0, 2, 1))
    out = jnp.stack([run_one(x_ct[i]) for i in range(b)])
    out = jnp.transpose(out, (0, 2, 1))

    if reference_fn is not None:
        out = _stitch_boundaries(out, x, reference_fn, halo, r)
    return out


def fused_amp_stage_cl_batched(
    x: jnp.ndarray,  # (B, T, C)
    stage_params: List[dict],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int],
    reference_fn=None,
    tile: int = 16384,
    interpret: bool = False,
    fast: bool = False,
    accum: str = "bf16",  # fused-stage numerics knob (see module top)
    conv: str = "tap",  # "tap" | "mstack" | "kstack" (see valid_conv_cl_*)
) -> jnp.ndarray:
    """fused_amp_stage_cl with a single 2D-grid pallas_call over
    (batch, tiles) instead of a per-batch Python loop of kernels — one
    dispatch for the whole stage, and the grid exposes batch-level
    parallelism to the pipeline scheduler.

    conv="kstack" runs the kernel interior at Cp = C rounded up to the
    16-row sublane tile: x and the per-channel params are zero/neutral-
    padded outside the kernel (free — a 24-row bf16 block already occupies
    32 physical rows), weights are K-stacked with zero pad rows/cols, and
    the out spec stores only the real C rows. Pad rows stay exactly 0
    through every op (FIR(0)=0, snake(0)=0 with beta padded to 1, conv pad
    rows have all-zero weights and bias)."""
    b, t, c = x.shape
    r = stage_radius(kernel_sizes, dilations)
    halo = (r + 127) // 128 * 128
    if t % tile != 0 or t < 2 * tile:
        return _fallback(reference_fn, x, t, tile)

    cp = -(-c // 16) * 16 if conv == "kstack" else c
    # neutral pad values: alpha/bias 0, beta 1 (snake(0) stays 0, no 1/eps)
    pad_val = {"a1": 0.0, "b1": 1.0, "c1b": 0.0, "a2": 0.0, "b2": 1.0, "c2b": 0.0}
    n_sub = len(dilations)
    flat: List[jnp.ndarray] = []
    for bi in range(len(kernel_sizes)):
        for si in range(n_sub):
            p = stage_params[bi]["sub"][si]
            for key in ("a1", "b1", "c1b", "a2", "b2", "c2b"):
                v = pad_channels(jnp.asarray(p[key]), cp, pad_val[key])
                flat.append(v[:, None])  # (Cp, 1)
            if conv == "mstack":
                # (k*C_out, C_in) M-stacked layout for the one-dot conv
                flat.append(stack_conv_weight_m(jnp.asarray(p["w1"])))
                flat.append(stack_conv_weight_m(jnp.asarray(p["w2"])))
            elif conv == "kstack":
                # (Cp, k*Cp) K-stacked layout for the one-dot conv
                flat.append(stack_conv_weight_k(jnp.asarray(p["w1"]), cp))
                flat.append(stack_conv_weight_k(jnp.asarray(p["w2"]), cp))
            else:
                # (k, C_in, C_out) -> (k, C_out, C_in) per-tap layout
                flat.append(jnp.transpose(jnp.asarray(p["w1"]), (0, 2, 1)))
                flat.append(jnp.transpose(jnp.asarray(p["w2"]), (0, 2, 1)))

    def kernel(x_hbm, *refs):
        out_ref = refs[-1]
        prefs = refs[:-1]
        ib = pl.program_id(0)
        it = pl.program_id(1)

        def body(scratch, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[ib, :, pl.ds(it * tile, tile + 2 * halo)], scratch, sem
            )
            dma.start()
            dma.wait()
            xblk = scratch[:]

            params = []
            idx = 0
            for bi in range(len(kernel_sizes)):
                subs = []
                for si in range(n_sub):
                    a1, b1, c1b, a2, b2, c2b = (prefs[idx + j][:, 0] for j in range(6))
                    w1t = prefs[idx + 6][:]
                    w2t = prefs[idx + 7][:]
                    idx += 8
                    subs.append({"a1": a1, "b1": b1, "c1b": c1b, "a2": a2,
                                 "b2": b2, "c2b": c2b, "w1t": w1t, "w2t": w2t})
                params.append({"sub": subs})
            y = stage_valid_cl(xblk, params, kernel_sizes, dilations, fast,
                               accum, conv)
            yc = _center_cl(y, tile)
            if cp != c:
                yc = jax.lax.slice(yc, (0, 0), (c, tile))
            out_ref[0, :, :] = yc.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((cp, tile + 2 * halo), x.dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    x_ct = jnp.transpose(x, (0, 2, 1))
    xp = jnp.pad(x_ct, ((0, 0), (0, cp - c), (halo, halo)))
    out = pl.pallas_call(
        kernel,
        grid=(b, t // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
        out_specs=pl.BlockSpec((1, c, tile), lambda ib, it: (ib, 0, it),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
        compiler_params=_compiler_params(2, accum, conv),
        interpret=interpret,
    )(xp, *flat)
    out = jnp.transpose(out, (0, 2, 1))

    if reference_fn is not None:
        out = _stitch_boundaries(out, x, reference_fn, halo, r)
    return out
