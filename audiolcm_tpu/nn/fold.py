"""Overlap-discard time folding: run a batch-1 conv stack as a small batch.

Motivation (round-5 b1 xplane attribution, DESIGN.md): at B=1 XLA lays the
wide BigVGAN stages out with the size-1 batch dim on the sublane axis and the
15 MB elementwise fusions run at ~70-130 GB/s vs the 565-648 GB/s the same
stages reach at b8 — 4.6-7.6x worse per clip. The fused Pallas stages are
immune because their grid is (batch x T-tiles); this module applies the same
trick at program level for the XLA stages: fold the time axis of a (1, T, C)
tensor into `fold` overlapping segments (1, T, C) -> (fold, T/fold + 2*halo,
C), run the stage as a batch, and stitch the valid interiors back together.

Exactness: with halo >= the stage's receptive field, every output sample in a
segment's valid region depends only on in-range input samples, so the math is
identical to the unfolded program regardless of each op's padding mode (the
stages mix zero-pad convs and edge-pad FIR resamplers). The first/last
segments are aligned with the true signal edges, so the per-layer boundary
padding there is the real program's own boundary behavior. Validated
exactly (f32 allclose) in tests/test_bigvgan_fold.py.

No reference analogue: torch dispatches eagerly per shape and its CUDA
kernels do not suffer the B=1 layout cliff (`vocoder/bigvgan/models.py`
simply runs batch 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_time(x: jnp.ndarray, fold: int, halo: int) -> jnp.ndarray:
    """(1, T, C) -> (fold, T/fold + 2*halo, C) overlapping segments.

    Segment k covers input [k*L - halo, (k+1)*L + halo) except the first and
    last, which are shifted to align with the true signal edges (so their
    per-layer boundary padding matches the unfolded program exactly).
    Requires T % fold == 0 and 2*halo <= L (callers gate on fold_legal).
    """
    b, t, _ = x.shape
    assert b == 1, "fold_time is the batch-1 path"
    length = t // fold
    seg = length + 2 * halo
    segs = []
    for k in range(fold):
        start = min(max(k * length - halo, 0), t - seg)
        segs.append(jax.lax.slice_in_dim(x, start, start + seg, axis=1))
    return jnp.concatenate(segs, axis=0)


def unfold_time(y: jnp.ndarray, fold: int, halo: int, length: int) -> jnp.ndarray:
    """Inverse of fold_time after the segment length scaled by the stage's
    upsample factor: (fold, length + 2*halo, C) -> (1, fold*length, C),
    discarding each segment's halo (offset 0 / halo / 2*halo for the
    edge-aligned first / interior / edge-aligned last segments)."""
    parts = []
    for k in range(fold):
        off = 0 if k == 0 else (2 * halo if k == fold - 1 else halo)
        parts.append(
            jax.lax.slice_in_dim(y[k : k + 1], off, off + length, axis=1)
        )
    return jnp.concatenate(parts, axis=1)


def stage_fold_halo(u: int, k_up: int, kernel_sizes, dilation_sizes) -> int:
    """Conservative receptive-field halo (in stage-INPUT samples) for one
    BigVGAN upsample stage: transposed conv (k_up, stride u) followed by the
    averaged AMPBlock1 resblocks.

    Per dilation sub-unit the output RF is act(+-6: 12-tap kaiser FIRs at the
    2x grid) + conv(k,d) + act(+-6) + conv(k,1); sub-units compose
    sequentially within a block, blocks are parallel (max). The ups conv
    spreads a further <= k_up output samples. +3 input frames of safety
    margin (exactness is asserted in tests, so the margin is free insurance,
    not a correctness crutch)."""
    act_rf = 6
    rf = max(
        sum(2 * act_rf + (k - 1) // 2 * (d + 1) for d in dils)
        for k, dils in zip(kernel_sizes, dilation_sizes)
    )
    return -(-(rf + k_up) // u) + 3


def fold_legal(t: int, fold: int, halo: int) -> bool:
    """True if (t, fold, halo) admits the static fold/unfold slicing."""
    return fold >= 2 and t % fold == 0 and 2 * halo <= t // fold
