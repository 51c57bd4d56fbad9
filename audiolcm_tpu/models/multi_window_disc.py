"""Multi-window mel discriminator (FastSpeech-style) for the VAE GAN variants.

Behavior parity: `ldm/modules/discriminator/multi_window_disc.py` —
`Discriminator2DFactory` (3 conv blocks, stride 2, LeakyReLU 0.2 + Dropout2d
0.25, linear adv head over flattened features, :6-63),
`MultiWindowDiscriminator` (random same-start clips per window length,
:66-148) and the `Discriminator` wrapper (:151-198). These are used by the
`contperceptual_multiw.py:27` ('bn', reduction='stack') and
`contperceptual_dis.py:43-45` ('in', reduction='stack') loss variants.

TPU-first notes:
  * Window lengths are static, so each window's conv stack compiles once;
    the random clip start is a traced scalar consumed by
    `jax.lax.dynamic_slice` — no recompiles across steps.
  * Windows longer than the (static) padded mel length are dropped at trace
    time, mirroring the reference's `clip() -> None` path
    (multi_window_disc.py:137-139) without data-dependent control flow.
  * Dropout2d (channel dropout) uses flax's rng system instead of module
    state.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.normal(0.02)


class Discriminator2DFactory(nn.Module):
    """One fixed-window 2D conv discriminator (multi_window_disc.py:6-63).

    Input (B, T, F, C) channels-last; T == time_length statically.
    """

    time_length: int
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    c_in: int = 1
    hidden_size: int = 128
    norm_type: str = "bn"  # 'bn' | 'in' | 'sn' (sn == no norm + spectral conv)
    reduction: str = "sum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        pad = [(self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2]
        hiddens = []
        h = x
        for i in range(3):
            conv = nn.Conv(
                self.hidden_size, self.kernel, strides=(2, 2), padding=pad,
                kernel_init=_conv_init, name=f"conv_{i}")
            if self.norm_type == "sn":
                conv = nn.SpectralNorm(conv)
                h = conv(h, update_stats=train)
            else:
                h = conv(h)
            h = nn.leaky_relu(h, 0.2)
            # Dropout2d drops whole channels (torch nn.Dropout2d(0.25))
            h = nn.Dropout(
                rate=0.25, broadcast_dims=(1, 2), deterministic=not train,
                name=f"drop_{i}")(h)
            if self.norm_type == "bn" and i > 0:
                # reference nn.BatchNorm2d(out, 0.8): positional 0.8 is EPS
                # (torch signature), momentum stays at torch default 0.1
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=0.8, name=f"bn_{i}")(h)
            elif self.norm_type == "in" and i > 0:
                # InstanceNorm(affine=True): normalize over (T, F) per sample
                h = nn.GroupNorm(num_groups=None, group_size=1,
                                 epsilon=1e-5, name=f"in_{i}")(h)
            hiddens.append(h)
        ds_t = self.time_length // 2**3
        ds_f = (self.freq_length + 7) // 2**3
        if self.reduction != "none":
            flat = h.reshape(h.shape[0], -1)  # (B, T'*F'*C)
            validity = nn.Dense(1, name="adv_layer")(flat)  # (B, 1)
        else:
            # per-frame logits (B, T'): flatten freq x channel per time step
            b, t, _, _ = h.shape
            flat = h.reshape(b, t, -1)
            validity = nn.Dense(1, name="adv_layer")(flat)[..., 0]
        del ds_t, ds_f  # shapes implied; kept for parity documentation
        return validity, hiddens


class MultiWindowDiscriminator(nn.Module):
    """Random fixed-length window clips -> per-window discriminators
    (multi_window_disc.py:66-148)."""

    time_lengths: Sequence[int]
    cond_size: int = 0
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    c_in: int = 1
    hidden_size: int = 128
    norm_type: str = "bn"
    reduction: str = "sum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_len: jnp.ndarray,
                 cond: Optional[jnp.ndarray] = None, train: bool = True):
        """x: (B, T, F, C); x_len: (B,) valid frame counts.

        Returns (validity, hiddens). Windows longer than T are dropped at
        trace time (reference returns None in that case and the loss skips).
        """
        t_total = x.shape[1]
        validity = []
        hiddens = []
        for i, win in enumerate(self.time_lengths):
            if win > t_total:
                continue
            # reference: start ~ U[0, max(x_len) - win] shared across batch
            t_end = jnp.maximum(jnp.max(x_len) - win, 0)
            rng = self.make_rng("windows")
            start = jax.random.randint(rng, (), 0, t_total)
            start = jnp.minimum(start, t_end)
            x_clip = jax.lax.dynamic_slice_in_dim(x, start, win, axis=1)
            if self.cond_size > 0 and cond is not None:
                c_clip = jax.lax.dynamic_slice_in_dim(cond, start, win, axis=1)
                # mel_proj acts on the freq axis: (B, win, F, C) -> same
                x_m = jnp.swapaxes(x_clip, 2, 3)  # (B, win, C, F)
                x_m = nn.Dense(self.freq_length, name=f"mel_proj_{i}")(x_m)
                c_proj = nn.Dense(self.freq_length, name=f"cond_proj_{i}")(c_clip)
                # reference adds cond as an extra (broadcast) channel dim
                x_clip = jnp.swapaxes(x_m + c_proj[:, :, None, :], 2, 3)
            v, h = Discriminator2DFactory(
                time_length=win, freq_length=self.freq_length,
                kernel=self.kernel, c_in=self.c_in,
                hidden_size=self.hidden_size, norm_type=self.norm_type,
                reduction=self.reduction, name=f"win_{win}")(x_clip, train=train)
            validity.append(v)
            hiddens.extend(h)
        if not validity:
            return None, hiddens
        if self.reduction == "sum":
            out = sum(validity)  # (B, 1)
        elif self.reduction == "stack":
            out = jnp.stack(validity, axis=-1)  # (B, 1, W)
        else:  # 'none'
            out = jnp.concatenate(validity, axis=-1)  # (B, sum W')
        return out, hiddens


class MultiWindowDiscriminatorWrapper(nn.Module):
    """`Discriminator` wrapper (multi_window_disc.py:151-198): optional
    unconditional + conditional towers, x_len inferred from non-zero frames."""

    time_lengths: Sequence[int] = (32, 64, 128)
    freq_length: int = 80
    cond_size: int = 0
    kernel: Tuple[int, int] = (3, 3)
    c_in: int = 1
    hidden_size: int = 128
    norm_type: str = "bn"
    reduction: str = "sum"
    uncond_disc: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None,
                 x_len: Optional[jnp.ndarray] = None, train: bool = True):
        """x: (B, T, F) mel (or (B, T, F, C)). Returns dict like reference."""
        if x.ndim == 3:
            x = x[..., None]
        if x_len is None:
            # reference: frames whose sum over (C, F) != 0 count as valid
            x_len = jnp.sum(
                (jnp.sum(x, axis=(2, 3)) != 0).astype(jnp.int32), axis=-1)
        ret = {"y": None, "y_c": None, "h": [], "h_c": []}
        if self.uncond_disc:
            y, h = MultiWindowDiscriminator(
                time_lengths=self.time_lengths, freq_length=self.freq_length,
                kernel=self.kernel, c_in=self.c_in,
                hidden_size=self.hidden_size, norm_type=self.norm_type,
                reduction=self.reduction, name="discriminator")(
                    x, x_len, train=train)
            ret["y"], ret["h"] = y, h
        if self.cond_size > 0 and cond is not None:
            y_c, h_c = MultiWindowDiscriminator(
                time_lengths=self.time_lengths, freq_length=self.freq_length,
                cond_size=self.cond_size, kernel=self.kernel, c_in=self.c_in,
                hidden_size=self.hidden_size, norm_type=self.norm_type,
                reduction=self.reduction, name="cond_disc")(
                    x, x_len, cond, train=train)
            ret["y_c"], ret["h_c"] = y_c, h_c
        return ret
