"""Batched STFT + log-mel spectrogram as pure XLA ops.

Numerics-parity target: the reference MelNet pipeline
(`ldm/data/preprocess/NAT_mel.py:64-85` and the hifigan-style
`vocoder/bigvgan/meldataset.py:60-85`):

    wav -> clamp(+-1) -> reflect-pad (n_fft-hop)/2 each side
        -> STFT (hann, center=False, onesided) -> sqrt(re^2+im^2+1e-9)
        -> slaney mel filterbank matmul -> log10(clamp(x, 1e-5))

TPU-first design notes:
  * framing is a gather-free reshape+slice pattern; the windowed frames are
    transformed with a single batched rFFT (XLA lowers this to the TPU FFT),
    and the mel projection is one (n_mels, n_freq) x (n_freq, frames) matmul
    that maps straight onto the MXU.
  * everything is shape-static: callers pick a duration bucket, the graph
    compiles once per bucket.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz->mel (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    f = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    default htk=False, norm='slaney' used by the reference
    (`NAT_mel.py:54`, `meldataset.py:60-67`).
    """
    n_freq = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freq)
    mel_pts = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style area normalization.
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_size: int) -> np.ndarray:
    """Periodic hann window (torch.hann_window default)."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """STFT/mel constants.

    Defaults = the generation pipeline's constants
    (`ldm/data/preprocess/mel_spec.py:196-211`): 16 kHz, 80 mels,
    n_fft=win=1024, hop=256, fmin=0, fmax=8000 -> 62.5 mel frames/sec.
    The BigVGAN training variant uses fmin=125, fmax=7600
    (`vocoder/bigvgan/bigvgan_audioset16khz_80band.json`).
    """

    sample_rate: int = 16000
    n_fft: int = 1024
    win_size: int = 1024
    hop_size: int = 256
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    clip_val: float = 1e-5
    # "10" = the generation pipeline's log10 (`NAT_mel.py:26`); "e" = the
    # hifi-gan-derived vocoder scripts' natural log
    # (`vocoder/bigvgan/meldataset.py:38-47` dynamic_range_compression).
    log_base: str = "10"
    # True = compute the |STFT| via stft_magnitude_matmul (DFT-as-matmul on
    # the MXU) instead of XLA's rFFT lowering. Numerically equivalent at
    # matmul-reassociation level (tested); a training-step A/B knob.
    stft_matmul: bool = False


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, frames, n_fft) with frame i starting at i*hop (center=False)."""
    b, length = y.shape
    n_frames = 1 + (length - n_fft) // hop
    # Gather-free framing: one strided gather via dynamic_slice vmap is slow;
    # instead build index matrix once (static) and use jnp.take along axis.
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[:, idx]  # (B, n_frames, n_fft)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size"))
def stft_magnitude(
    y: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
) -> jnp.ndarray:
    """|STFT| with center=False, onesided. (B, L) -> (B, n_fft//2+1, frames).

    Magnitude uses sqrt(re^2 + im^2 + 1e-9) exactly as the reference
    (`NAT_mel.py:79`).
    """
    frames = _frame(y, n_fft, hop_size)
    if win_size < n_fft:
        pad = (n_fft - win_size) // 2
        window = jnp.pad(window, (pad, n_fft - win_size - pad))
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, frames, n_freq)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.transpose(mag, (0, 2, 1))  # (B, n_freq, frames)


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int) -> tuple:
    """Real-DFT basis matrices (n_fft, n_fft//2+1): re = x @ C, im = x @ S."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_size"))
def stft_magnitude_matmul(
    y: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    win_size: int,
) -> jnp.ndarray:
    """stft_magnitude with the rFFT expressed as two DFT matmuls.

    TPU-first alternative for the MRD discriminators' small STFTs
    (`vocoder/bigvgan/models.py:319-327`): XLA's TPU FFT lowering is a
    generic radix decomposition, while an explicit (frames, n_fft) @
    (n_fft, n_fft//2+1) pair of cos/sin matmuls rides the MXU directly —
    at n_fft <= 2048 the DFT matrix is tiny and the whole magnitude
    pipeline fuses into two matmuls + one elementwise pass. f32
    accumulation; numerics vs the rfft path are at matmul-reassociation
    level (tested in tests/test_vocoder_gan.py).
    """
    frames = _frame(y, n_fft, hop_size)
    if win_size < n_fft:
        pad = (n_fft - win_size) // 2
        window = jnp.pad(window, (pad, n_fft - win_size - pad))
    frames = frames * window[None, None, :]
    cos_b, sin_b = _dft_basis(n_fft)
    cos_b = jnp.asarray(cos_b, dtype=frames.dtype)
    sin_b = jnp.asarray(sin_b, dtype=frames.dtype)
    re = jnp.einsum(
        "bfn,nk->bfk", frames, cos_b, preferred_element_type=jnp.float32
    )
    im = jnp.einsum(
        "bfn,nk->bfk", frames, sin_b, preferred_element_type=jnp.float32
    )
    mag = jnp.sqrt(re * re + im * im + 1e-9).astype(y.dtype)
    return jnp.transpose(mag, (0, 2, 1))  # (B, n_freq, frames)


class MelSpectrogram:
    """Precomputed-constant log-mel transform; call on (B, L) or (L,) wav."""

    def __init__(self, config: MelConfig = MelConfig()):
        self.config = config
        self.mel_basis = jnp.asarray(
            mel_filterbank(
                config.sample_rate, config.n_fft, config.n_mels, config.fmin, config.fmax
            )
        )
        self.window = jnp.asarray(hann_window(config.win_size))

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """wav (B, L) in [-1, 1] -> log10-mel (B, n_mels, frames)."""
        cfg = self.config
        if y.ndim == 1:
            y = y[None, :]
        y = jnp.clip(y, -1.0, 1.0)
        pad = (cfg.n_fft - cfg.hop_size) // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        stft = stft_magnitude_matmul if cfg.stft_matmul else stft_magnitude
        mag = stft(y, self.window, cfg.n_fft, cfg.hop_size, cfg.win_size)
        mel = jnp.einsum(
            "mf,bft->bmt", self.mel_basis, mag, preferred_element_type=jnp.float32
        )
        log = jnp.log if cfg.log_base == "e" else jnp.log10
        return log(jnp.clip(mel, cfg.clip_val, None))

    def num_frames(self, num_samples: int) -> int:
        cfg = self.config
        padded = num_samples + 2 * ((cfg.n_fft - cfg.hop_size) // 2)
        return 1 + (padded - cfg.n_fft) // cfg.hop_size
