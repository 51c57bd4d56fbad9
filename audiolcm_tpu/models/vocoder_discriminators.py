"""BigVGAN discriminators: multi-period (MPD) + multi-resolution (MRD).

Behavior parity: `vocoder/bigvgan/models.py:216-355` with the 16 kHz config:
  * DiscriminatorP per period in (2,3,5,7,11): wav reflect-padded to a
    multiple of the period, folded to (B, T/p, p, 1), Conv2d (5,1)-kernel
    stride-(3,1) stack with LeakyReLU(0.1), feature maps collected for the
    feature-matching loss.
  * DiscriminatorR per STFT resolution ((1024,120,600),(2048,240,1200),
    (512,50,240)): rectangular-window magnitude STFT, Conv2d (3,9) stack
    with stride (1,2), LeakyReLU(0.1).
All reference convs are weight_norm'd; training here uses plain kernels
(weight_norm is an optimization trick, not a graph difference; converted
inference checkpoints are folded the same way).

Channels-last; the STFT reuses the framing+rFFT path from dsp.mel.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from audiolcm_tpu.dsp.mel import stft_magnitude, stft_magnitude_matmul

_init = nn.initializers.normal(0.01)
LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """Period-folded 2D conv discriminator (`models.py:216-250`).

    Every kernel is (k, 1): the period axis is never mixed, so the network
    is exactly `period` independent 1D conv stacks over T/period.
    fold_mode picks the layout (param tree and losses are identical):
      * "width"  — the reference layout, (B, T/p, p, 1) with p as the conv
        width dim.
      * "batch"  — TPU layout experiment (VERDICT r4 #7): p folds into the
        batch, (B*p, T/p, 1, 1), removing the stride-p minor axis from
        every conv's layout. Logits/fmaps are permutations of the "width"
        ones; LSGAN + feature-matching losses are elementwise means, so
        training is equivalent as long as real/fake use the same mode.
    """

    period: int
    d_mult: int = 1
    fold_mode: str = "width"

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """wav (B, T) -> (patch logits flattened, fmaps)."""
        b, t = wav.shape
        p = self.period
        if t % p != 0:
            pad = p - t % p
            wav = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        if self.fold_mode == "batch":
            # (B, T) -> (B, T/p, p) -> (B, p, T/p) -> (B*p, T/p, 1, 1)
            x = wav.reshape(b, t // p, p).transpose(0, 2, 1)
            x = x.reshape(b * p, t // p, 1, 1)
        else:
            x = wav.reshape(b, t // p, p, 1)

        fmap = []
        widths = [32, 128, 512, 1024]
        for i, w in enumerate(widths):
            x = nn.Conv(
                w * self.d_mult, (5, 1), strides=(3, 1), padding=[(2, 2), (0, 0)],
                kernel_init=_init, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(
            1024 * self.d_mult, (5, 1), strides=(1, 1), padding=[(2, 2), (0, 0)],
            kernel_init=_init, name="conv_4",
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], kernel_init=_init,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorR(nn.Module):
    """STFT-magnitude 2D conv discriminator (`models.py:277-317`).

    stft_matmul=True computes the magnitude STFT as two DFT matmuls instead
    of XLA's FFT lowering (dsp.mel.stft_magnitude_matmul) — a TPU layout
    experiment for the training step, where the 3 resolutions x (real, fake)
    rffts are latency- rather than FLOP-bound. Param tree and losses are
    identical; numerics differ only at matmul-reassociation level.
    """

    resolution: Sequence[int]  # (n_fft, hop, win)
    d_mult: int = 1
    stft_matmul: bool = False

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        n_fft, hop, win = self.resolution
        pad = (n_fft - hop) // 2
        y = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        # rectangular window (torch.stft with window=None), `models.py:319-327`
        window = jnp.ones((win,), dtype=y.dtype)
        stft = stft_magnitude_matmul if self.stft_matmul else stft_magnitude
        mag = stft(y, window, n_fft, hop, win)  # (B, F, TT)
        x = jnp.transpose(mag, (0, 2, 1))[..., None]  # (B, TT, F, 1)

        fmap = []
        ch = 32 * self.d_mult
        specs = [
            ((3, 9), (1, 1)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 9), (1, 2)),
            ((3, 3), (1, 1)),
        ]
        for i, (k, s) in enumerate(specs):
            x = nn.Conv(
                ch, k, strides=s,
                padding=[(k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2)],
                kernel_init=_init, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=_init,
                    name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _apply_pair(d, y, y_hat, pair_batch):
    """Run a sub-discriminator on (real, fake). pair_batch=True concatenates
    the pair on the batch axis so each conv stack dispatches ONCE at 2B
    (exact: shared params, pure convs + elementwise acts, so d(cat) ==
    cat(d); logits/fmaps split back on the batch-major axis)."""
    if not pair_batch:
        lr, fr = d(y)
        lg, fg = d(y_hat)
        return lr, lg, fr, fg
    b = y.shape[0]
    logits, fmaps = d(jnp.concatenate([y, y_hat], axis=0))
    lr, lg = logits[:b], logits[b:]
    # fmap batch axis is 2B ("width" fold / MRD) or 2B*p ("batch" fold);
    # either way the first half is the real rows (batch-major fold order)
    fr = [f[: f.shape[0] // 2] for f in fmaps]
    fg = [f[f.shape[0] // 2:] for f in fmaps]
    return lr, lg, fr, fg


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    d_mult: int = 1
    fold_mode: str = "width"  # see DiscriminatorP
    pair_batch: bool = False  # batch (real, fake) into one 2B apply

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        reals, fakes, fmap_r, fmap_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, self.d_mult, fold_mode=self.fold_mode,
                               name=f"p{p}")
            lr, lg, fr, fg = _apply_pair(d, y, y_hat, self.pair_batch)
            reals.append(lr)
            fakes.append(lg)
            fmap_r.append(fr)
            fmap_g.append(fg)
        return reals, fakes, fmap_r, fmap_g


class MultiResolutionDiscriminator(nn.Module):
    resolutions: Sequence[Sequence[int]] = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    d_mult: int = 1
    pair_batch: bool = False  # batch (real, fake) into one 2B apply
    stft_matmul: bool = False  # DFT-matmul STFTs (see DiscriminatorR)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        reals, fakes, fmap_r, fmap_g = [], [], [], []
        for res in self.resolutions:
            d = DiscriminatorR(tuple(res), self.d_mult,
                               stft_matmul=self.stft_matmul, name=f"r{res[0]}")
            lr, lg, fr, fg = _apply_pair(d, y, y_hat, self.pair_batch)
            reals.append(lr)
            fakes.append(lg)
            fmap_r.append(fr)
            fmap_g.append(fg)
        return reals, fakes, fmap_r, fmap_g
