"""BigVGAN generator: mel (B, T, 80) -> waveform (B, 256*T).

Behavior parity: `vocoder/bigvgan/models.py:30-213` with the shipped 16 kHz
config (`bigvgan_audioset16khz_80band.json`): conv_pre k7 -> 6 transposed-conv
upsample stages (rates 4,4,2,2,2,2 / kernels 8,8,4,4,4,4, channel halving
from 1536) each followed by the average of 3 AMP residual blocks (kernels
3,7,11, dilations 1,3,5) -> snakebeta -> conv_post k7 -> tanh. All reference
convs carry weight_norm, which the checkpoint converter folds into plain
kernels (inference-equivalent).

TPU-first notes: channels-last layout; the transposed convs are
lax.conv_general_dilated with lhs_dilation (no scatter); the snakebeta +
anti-aliased resampling chain is pure fusible elementwise + depthwise-conv
work between the big MXU convs. The entire x256 upsampling stack compiles
into a single XLA program per duration bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.resample import (
    alias_free_activation,
    alias_free_activation_fused,
)
from audiolcm_tpu.nn.snake import Snake, SnakeBeta

# Measured on v5e (b8, 10 s clips): the analytically-fused shift-add
# activation is ~2x faster than the depthwise-conv path at narrow widths
# (C<=32, the final upsample stage) but slower at wide ones, where the
# grouped convs amortize well. Dispatch per activation-site accordingly.
_FUSED_ACT_MAX_CHANNELS = 32


def _alias_free(x, act_fn):
    if x.shape[-1] <= _FUSED_ACT_MAX_CHANNELS:
        return alias_free_activation_fused(x, act_fn)
    return alias_free_activation(x, act_fn)


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    resblock: str = "1"
    # Serving option: polynomial cos inside the snakes (nn/snake.py:fast_cos;
    # max err 4.8e-7 — below bf16 output resolution, but not bit-identical
    # to the reference math, so off by default).
    fast_snake: bool = False

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def _norm_init():
    return nn.initializers.normal(0.01)


class ConvTranspose1dTorchParity(nn.Module):
    """Transposed conv matching torch's ConvTranspose1d(k, stride=u, padding=(k-u)//2).

    Output length is exactly T*u. The kernel is stored in lax HIO layout with
    time already flipped (the converter handles torch's adjoint semantics),
    so the forward is a plain lhs-dilated correlation.
    """

    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, u = self.kernel_size, self.stride
        crop = (k - u) // 2
        kernel = self.param(
            "kernel", _norm_init(), (k, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1 - crop, k - 1 - crop)],
            lhs_dilation=(u,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return out + bias


def _conv1d(features: int, kernel: int, dilation: int = 1, name: str | None = None):
    pad = (kernel * dilation - dilation) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel,),
        padding=[(pad, pad)],
        kernel_dilation=(dilation,),
        kernel_init=_norm_init(),
        name=name,
    )


class _SnakeParams(nn.Module):
    """Raw snake alpha/beta with Snake(Beta)'s exact param tree (for the
    channels-first path, which needs the values rather than the module)."""

    logscale: bool = True
    single: bool = False  # Snake variant: alpha doubles as the magnitude

    @nn.compact
    def __call__(self, channels: int):
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (channels,))
        beta = alpha if self.single else self.param("beta", init, (channels,))
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return alpha, beta


class _ConvParams(nn.Module):
    """Conv kernel/bias with nn.Conv's exact param tree (channels-first path)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", _norm_init(), (self.kernel_size, in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class AMPBlock1(nn.Module):
    """`models.py:30-81`: 3x(act -> dilated conv -> act -> conv) residual.

    channels_first=True runs the identical math on (B, C, T) tensors so the
    time axis rides the vector lanes — the fast path for narrow widths
    (see nn/resample_cf.py). Param trees are byte-identical between paths,
    so checkpoints are layout-agnostic.
    """

    kernel_size: int
    dilations: Sequence[int]
    snake_logscale: bool = True
    activation: str = "snakebeta"
    channels_first: bool = False
    fast_snake: bool = False
    # serving knob: dynamic-int8 convs (2x MXU rate at the wide stages; see
    # nn/int8_conv.py). Param tree stays byte-identical (_ConvParams mirrors
    # nn.Conv), so checkpoints are knob-agnostic like the other paths.
    int8_convs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.channels_first:
            from audiolcm_tpu.nn.resample_cf import alias_free_snake_cf, conv1d_cf

            channels = x.shape[1]
            single = self.activation != "snakebeta"
            for i, d in enumerate(self.dilations):
                a1, b1 = _SnakeParams(self.snake_logscale, single, name=f"act1_{i}")(channels)
                a2, b2 = _SnakeParams(self.snake_logscale, single, name=f"act2_{i}")(channels)
                w1, c1b = _ConvParams(channels, self.kernel_size, name=f"conv1_{i}")(channels)
                w2, c2b = _ConvParams(channels, self.kernel_size, name=f"conv2_{i}")(channels)
                h = alias_free_snake_cf(x, a1, b1, fast=self.fast_snake)
                h = conv1d_cf(h, w1.astype(x.dtype), c1b.astype(x.dtype), d)
                h = alias_free_snake_cf(h, a2, b2, fast=self.fast_snake)
                h = conv1d_cf(h, w2.astype(x.dtype), c2b.astype(x.dtype), 1)
                x = x + h
            return x

        channels = x.shape[-1]
        act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
        for i, d in enumerate(self.dilations):
            a1 = act_cls(self.snake_logscale, fast=self.fast_snake, name=f"act1_{i}")
            a2 = act_cls(self.snake_logscale, fast=self.fast_snake, name=f"act2_{i}")
            h = _alias_free(x, a1)
            h = self._conv(channels, d, f"conv1_{i}")(h)
            h = _alias_free(h, a2)
            h = self._conv(channels, 1, f"conv2_{i}")(h)
            x = x + h
        return x

    def _conv(self, channels: int, dilation: int, name: str):
        if not self.int8_convs:
            return _conv1d(channels, self.kernel_size, dilation, name=name)
        from audiolcm_tpu.nn.int8_conv import int8_conv1d_cl

        w, b = _ConvParams(channels, self.kernel_size, name=name)(channels)
        return lambda h: int8_conv1d_cl(h, w, b, dilation)


class AMPBlock2(nn.Module):
    """`models.py:90-126`: lighter 2x(act -> dilated conv) residual variant."""

    kernel_size: int
    dilations: Sequence[int]
    snake_logscale: bool = True
    activation: str = "snakebeta"
    fast_snake: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        act_cls = SnakeBeta if self.activation == "snakebeta" else Snake
        for i, d in enumerate(self.dilations):
            a = act_cls(self.snake_logscale, fast=self.fast_snake, name=f"act_{i}")
            h = _alias_free(x, a)
            h = _conv1d(channels, self.kernel_size, d, name=f"conv_{i}")(h)
            x = x + h
        return x


# Narrow stages run channels-FIRST so the long time axis rides the vector
# lanes (xplane-measured: the C-on-lanes snake fusions were 228 ms/iter at
# C=24..96); wide stages stay channels-last for MXU-friendly convs.
# Bench sweep (b8, 10 s, bf16): threshold 48 -> 174.6x realtime; 24 -> 167.7;
# 96 -> 160.1; 0 (all channels-last) -> 169.7.
_CF_STAGE_MAX_CHANNELS = 48


class _AMPBlockParams(nn.Module):
    """AMPBlock1's exact param tree, returned as raw arrays for the fused
    Pallas stage (nn/pallas_amp_stage.py). Sub-module names match AMPBlock1's
    (act1_i/act2_i/conv1_i/conv2_i), so checkpoints are path-agnostic."""

    kernel_size: int
    dilations: Sequence[int]
    snake_logscale: bool = True
    single: bool = False

    @nn.compact
    def __call__(self, channels: int) -> dict:
        subs = []
        for i in range(len(self.dilations)):
            a1, b1 = _SnakeParams(self.snake_logscale, self.single, name=f"act1_{i}")(channels)
            a2, b2 = _SnakeParams(self.snake_logscale, self.single, name=f"act2_{i}")(channels)
            w1, c1b = _ConvParams(channels, self.kernel_size, name=f"conv1_{i}")(channels)
            w2, c2b = _ConvParams(channels, self.kernel_size, name=f"conv2_{i}")(channels)
            subs.append({"a1": a1, "b1": b1, "w1": w1, "c1b": c1b,
                         "a2": a2, "b2": b2, "w2": w2, "c2b": c2b})
        return {"sub": subs}


def _pick_stage_tile(t: int, max_tile: int = 9984, min_tile: int = 512) -> int:
    """Largest multiple-of-128 tile <= max_tile that divides t (with at least
    two tiles); 0 if none — caller falls back to the unfused path.

    min_tile bounds the halo waste, not compile legality: each grid step
    loads tile + 2*128 halo samples, so tile 512 wastes 33% of the loaded
    window and smaller tiles quickly drown the fusion win. At the production
    10 s shapes (T = 312*2^k) the first stage without a large legal tile is
    C=96/T=39936: divisors of 312 jump from 13 to 24, so under the constant
    C*tile compile budget (max_tile 2432) the old min_tile=2048 floor left
    NO legal tile and the stage silently fell back to XLA — tile 1664 fuses
    it with 13% halo overhead."""
    for mult in range(max_tile // 128, min_tile // 128 - 1, -1):
        tile = mult * 128
        if t % tile == 0 and t >= 2 * tile:
            return tile
    return 0


class BigVGAN(nn.Module):
    config: BigVGANConfig = BigVGANConfig()
    cf_max_channels: int = _CF_STAGE_MAX_CHANNELS
    # Serving knob: stages with ch <= this run as ONE fused Pallas kernel
    # (nn/pallas_amp_stage.py) computing the whole 3-resblock stage per VMEM
    # tile — measured 2.4x over the cf XLA path at C=24 (111 -> 47 ms, b8
    # 10 s bf16). 0 = off (default: the Mosaic compile of the big unrolled
    # stage adds tens of minutes cold, so it is opt-in for serving).
    pallas_stage_max_channels: int = 0
    # Fused-stage numerics: "bf16" (fastest, 0.28% mean bf16-vs-f32 error) or
    # "f32" (FIR/average accumulators in f32, error <= the XLA path's 0.09%,
    # measured ~30% slower end-to-end — see nn/pallas_amp_stage.py)
    pallas_stage_accum: str = "bf16"
    # Fused-stage conv formulation: "tap" (round-1 per-tap dots) or "mstack"
    # (one M-stacked dot + shifted adds; ~5x better MXU utilization at the
    # narrow widths — see nn/pallas_amp_stage.py:valid_conv_cl_mstack)
    pallas_stage_conv: str = "tap"
    # Serving knob: stages with ch >= this run their resblock convs with
    # dynamic int8 (2x MXU rate; see nn/int8_conv.py). 0 = off (default).
    int8_min_channels: int = 0
    # Batch-1 serving knob: fold the time axis of the XLA (non-Pallas) stages
    # into this many overlap-discard segments so B=1 runs as a small batch
    # (see nn/fold.py — the b1 wide stages are 4.6-7.6x off their b8
    # per-clip cost purely from XLA's B=1 layout). 0 = off (default).
    # Exact: halo covers each stage's receptive field; edge segments are
    # aligned with the true signal edges. Only engages at batch 1.
    fold_t_segments: int = 0
    pallas_interpret: bool = False  # tests: run the kernel in interpret mode

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, num_mels) -> waveform (B, 256*T) in [-1, 1]."""
        cfg = self.config
        x = _conv1d(cfg.upsample_initial_channel, 7, name="conv_pre")(mel)
        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            if (
                cfg.resblock == "1"
                and cfg.activation == "snakebeta"
                and ch <= self.pallas_stage_max_channels
                and all(tuple(rd) == tuple(cfg.resblock_dilation_sizes[0])
                        for rd in cfg.resblock_dilation_sizes)
                # constant C*tile budget: Mosaic compile time and VMEM both
                # scale with the (C, tile) block, so wider stages tile shorter
                and (tile := _pick_stage_tile(
                    x.shape[1] * u, max_tile=max(2048, (9984 * 24 // ch) // 128 * 128)
                ))
            ):
                x = ConvTranspose1dTorchParity(ch, k, u, name=f"ups_{i}")(x)
                x = self._pallas_stage(x, i, tile)
                continue
            # Batch-1 overlap-discard fold (nn/fold.py): run this XLA stage
            # as a `fold` segment batch. Exact (halo >= stage RF, edge
            # segments aligned with the true edges); skipped silently when
            # the shape doesn't admit it.
            folded = False
            if self.fold_t_segments >= 2 and x.shape[0] == 1 and cfg.resblock == "1":
                from audiolcm_tpu.nn.fold import (
                    fold_legal,
                    fold_time,
                    stage_fold_halo,
                    unfold_time,
                )

                halo = stage_fold_halo(
                    u, k, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes
                )
                if fold_legal(x.shape[1], self.fold_t_segments, halo):
                    seg_len = x.shape[1] // self.fold_t_segments
                    x = fold_time(x, self.fold_t_segments, halo)
                    folded = True
            x = ConvTranspose1dTorchParity(ch, k, u, name=f"ups_{i}")(x)
            cf = cfg.resblock == "1" and ch <= self.cf_max_channels
            if cf:
                x = jnp.transpose(x, (0, 2, 1))  # one transpose per stage
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                if cfg.resblock == "1":
                    h = AMPBlock1(
                        rk, tuple(rd), cfg.snake_logscale, cfg.activation,
                        channels_first=cf, fast_snake=cfg.fast_snake,
                        int8_convs=(not cf and 0 < self.int8_min_channels <= ch),
                        name=f"resblock_{i}_{j}",
                    )(x)
                else:
                    h = AMPBlock2(
                        rk, tuple(rd), cfg.snake_logscale, cfg.activation,
                        fast_snake=cfg.fast_snake, name=f"resblock_{i}_{j}",
                    )(x)
                acc = h if acc is None else acc + h
            x = acc / num_kernels
            if cf:
                x = jnp.transpose(x, (0, 2, 1))
            if folded:
                x = unfold_time(x, self.fold_t_segments, halo * u, seg_len * u)
        # Tail (act_post -> conv_post k7 -> tanh) over the LONGEST stream of
        # the net (T = 256*mel_T): at the final C=24 the channels-last FIRs
        # fill 19% of the lanes; the channels-first math (same modules'
        # param trees, same composition as the stage bodies) measured 1.76x —
        # 6.05 -> 3.44 ms b8 10 s bf16 incl. the transpose
        # (tools/bench_post.py). Same width dispatch rule as the stages.
        ch_final = x.shape[-1]
        if cfg.resblock == "1" and ch_final <= self.cf_max_channels:
            from audiolcm_tpu.nn.resample_cf import alias_free_snake_cf, conv1d_cf

            single = cfg.activation != "snakebeta"
            a_post, b_post = _SnakeParams(
                cfg.snake_logscale, single, name="act_post"
            )(ch_final)
            w_post, cb_post = _ConvParams(1, 7, name="conv_post")(ch_final)
            h = jnp.transpose(x, (0, 2, 1))
            h = alias_free_snake_cf(h, a_post, b_post, fast=cfg.fast_snake)
            h = conv1d_cf(h, w_post.astype(x.dtype), cb_post.astype(x.dtype), 1)
            return jnp.tanh(h)[:, 0, :]
        act_cls = SnakeBeta if cfg.activation == "snakebeta" else Snake
        x = _alias_free(
            x, act_cls(cfg.snake_logscale, fast=cfg.fast_snake, name="act_post")
        )
        x = _conv1d(1, 7, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]

    def _pallas_stage(self, x: jnp.ndarray, i: int, tile: int) -> jnp.ndarray:
        """Whole upsample stage i (3 resblocks averaged) as one fused Pallas
        kernel. Param tree identical to the AMPBlock1 path; boundary strips
        (where padding semantics apply) are stitched from the unfused cf math."""
        from audiolcm_tpu.nn.pallas_amp_stage import fused_amp_stage_cl_batched
        from audiolcm_tpu.nn.resample_cf import alias_free_snake_cf, conv1d_cf

        cfg = self.config
        ch = x.shape[-1]
        kernel_sizes = tuple(cfg.resblock_kernel_sizes)
        dilations = tuple(cfg.resblock_dilation_sizes[0])
        sp = [
            _AMPBlockParams(
                rk, dilations, cfg.snake_logscale, name=f"resblock_{i}_{j}"
            )(ch)
            for j, rk in enumerate(kernel_sizes)
        ]
        sp = jax.tree.map(lambda a: a.astype(x.dtype), sp)

        def ref_fn(xl: jnp.ndarray) -> jnp.ndarray:
            h = jnp.transpose(xl, (0, 2, 1))
            acc = None
            for bi in range(len(kernel_sizes)):
                h_res = h
                for si, d in enumerate(dilations):
                    p = sp[bi]["sub"][si]
                    y = alias_free_snake_cf(h_res, p["a1"], p["b1"], fast=cfg.fast_snake)
                    y = conv1d_cf(y, p["w1"], p["c1b"], d)
                    y = alias_free_snake_cf(y, p["a2"], p["b2"], fast=cfg.fast_snake)
                    y = conv1d_cf(y, p["w2"], p["c2b"], 1)
                    h_res = h_res + y
                acc = h_res if acc is None else acc + h_res
            return jnp.transpose(acc / len(kernel_sizes), (0, 2, 1))

        return fused_amp_stage_cl_batched(
            x, sp, kernel_sizes, dilations, reference_fn=ref_fn, tile=tile,
            interpret=self.pallas_interpret, fast=cfg.fast_snake,
            accum=self.pallas_stage_accum, conv=self.pallas_stage_conv,
        )
