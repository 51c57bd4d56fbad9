"""VGGish (AudioSet) embedding tower for the FAD eval harness.

The reference's FAD (`wav_evaluation/metrics/fad.py:18,39`) imports a vendored
torch VGGish (`src/torchvggish`) that is absent from its own repo; this is the
self-contained JAX equivalent so `cli/cal_fad_score.py --use_vggish` needs no
network access. Math follows Google's public VGGish definition (the
`mel_features.py`/`vggish_input.py` pipeline + the VGG convnet released with
AudioSet, as mirrored by the `torchvggish` port the reference intended to
vendor):

  wav 16 kHz mono
  -> frames win 400 / hop 160, periodic Hann, |rfft(., 512)|
  -> 64-band HTK-scale mel (125..7500 Hz), log(mel + 0.01)
  -> non-overlapping 96-frame (0.96 s) examples of shape (96, 64)
  -> VGG: [64, M, 128, M, 256, 256, M, 512, 512, M] 3x3 convs (ReLU)
  -> flatten (6, 4, 512) -> fc 4096 -> 4096 -> 128 (all ReLU)
  optional PCA+quantization postprocessor (release-time params).

Weights load from a torchvggish-layout state dict via `convert_vggish`
(validated against a functional torch re-derivation in tests/test_eval.py).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VGGishConfig:
    sample_rate: int = 16000
    stft_window: int = 400  # 25 ms
    stft_hop: int = 160  # 10 ms
    fft_length: int = 512
    mel_bins: int = 64
    fmin: float = 125.0
    fmax: float = 7500.0
    log_offset: float = 0.01
    example_frames: int = 96  # 0.96 s windows, non-overlapping
    embedding_dim: int = 128


def _hertz_to_mel(f):
    """HTK mel scale (mel_features uses 1127*ln(1+f/700))."""
    return 1127.0 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)


def vggish_mel_matrix(cfg: VGGishConfig = VGGishConfig()) -> np.ndarray:
    """(spectrogram_bins, mel_bins) triangular weights on the HTK mel scale,
    band edges linearly spaced in mel between fmin and fmax; DC row zeroed."""
    bins = cfg.fft_length // 2 + 1
    spec_mel = _hertz_to_mel(np.linspace(0.0, cfg.sample_rate / 2.0, bins))
    edges = np.linspace(_hertz_to_mel(cfg.fmin), _hertz_to_mel(cfg.fmax),
                        cfg.mel_bins + 2)
    weights = np.empty((bins, cfg.mel_bins), dtype=np.float64)
    for i in range(cfg.mel_bins):
        lo, center, hi = edges[i : i + 3]
        lower = (spec_mel - lo) / (center - lo)
        upper = (hi - spec_mel) / (hi - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    weights[0, :] = 0.0
    return weights.astype(np.float32)


def vggish_log_mel_examples(wav: jnp.ndarray, cfg: VGGishConfig = VGGishConfig()) -> jnp.ndarray:
    """wav (B, L) at 16 kHz -> (B, num_examples, 96, 64) log-mel patches.

    Framing is pad-free on both levels (num = 1 + (len - win) // hop); the
    rfft zero-pads each 400-sample windowed frame to 512 at the END (numpy
    rfft(n=512) semantics, unlike the centered padding of the music mel path).
    """
    b, length = wav.shape
    n_frames = 1 + (length - cfg.stft_window) // cfg.stft_hop
    idx = (np.arange(cfg.stft_window)[None, :]
           + cfg.stft_hop * np.arange(n_frames)[:, None])
    frames = wav[:, idx]  # (B, n_frames, win)
    n = np.arange(cfg.stft_window)
    window = jnp.asarray(
        (0.5 - 0.5 * np.cos(2.0 * np.pi * n / cfg.stft_window)).astype(np.float32)
    )
    mag = jnp.abs(jnp.fft.rfft(frames * window, n=cfg.fft_length, axis=-1))
    mel = mag @ jnp.asarray(vggish_mel_matrix(cfg))  # (B, n_frames, 64)
    logmel = jnp.log(mel + cfg.log_offset)
    n_examples = n_frames // cfg.example_frames
    logmel = logmel[:, : n_examples * cfg.example_frames]
    return logmel.reshape(b, n_examples, cfg.example_frames, cfg.mel_bins)


class VGGish(nn.Module):
    """Log-mel examples (B, 96, 64) -> 128-d embeddings (B, 128)."""

    config: VGGishConfig = VGGishConfig()

    @nn.compact
    def __call__(self, examples: jnp.ndarray,
                 include_final_relu: bool = True) -> jnp.ndarray:
        x = examples[..., None]  # NHWC (B, 96, 64, 1)
        for i, width in enumerate((64, 128, 256, 256, 512, 512)):
            x = nn.Conv(width, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in (0, 1, 3, 5):  # torchvggish pools after 64, 128, 256x2, 512x2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # torch flattens (B, H, W, C) after its transpose dance — NHWC already is
        x = x.reshape(x.shape[0], -1)  # (B, 6*4*512)
        x = nn.relu(nn.Dense(4096, name="fc0")(x))
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.Dense(self.config.embedding_dim, name="fc2")(x)
        # FAD embeddings are the RAW fc2 output: the reference builds VGGish
        # with use_activation=False (wav_evaluation/metrics/fad.py:53-61),
        # stripping this last ReLU. Keep it only for the full torchvggish
        # forward (e.g. feeding the PCA postprocessor).
        return nn.relu(x) if include_final_relu else x

    def embed_waveform(self, variables, wav: jnp.ndarray,
                       include_final_relu: bool = False) -> jnp.ndarray:
        """wav (B, L) -> (B*num_examples, 128): frontend + tower.

        Defaults to the pre-activation fc2 output — the FAD convention
        (reference fad.py:53-61 passes use_activation=False)."""
        ex = vggish_log_mel_examples(wav, self.config)
        flat = ex.reshape(-1, self.config.example_frames, self.config.mel_bins)
        return self.apply(variables, flat, include_final_relu=include_final_relu)


def vggish_postprocess(
    embeddings: jnp.ndarray,
    pca_eigen_vectors: jnp.ndarray,
    pca_means: jnp.ndarray,
    quantize: bool = True,
) -> jnp.ndarray:
    """Release-time PCA whitening (+ optional 8-bit quantization), matching
    torchvggish's Postprocessor: clamp to [-2, 2], map to [0, 255]."""
    x = (embeddings - pca_means[None, :]) @ pca_eigen_vectors.T
    x = jnp.clip(x, -2.0, 2.0)
    if quantize:
        x = jnp.round((x + 2.0) * (255.0 / 4.0))
    return x


def convert_vggish(sd: dict) -> dict:
    """torchvggish state dict -> flax variables.

    torch keys: features.{0,3,6,8,11,13}.{weight,bias} (convs, OIHW) and
    embeddings.{0,2,4}.{weight,bias} (linears, (out, in)).
    """
    params: dict = {}
    for i, t in enumerate((0, 3, 6, 8, 11, 13)):
        w = np.asarray(sd[f"features.{t}.weight"])
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"features.{t}.bias"]),
        }
    for i, t in enumerate((0, 2, 4)):
        params[f"fc{i}"] = {
            "kernel": np.asarray(sd[f"embeddings.{t}.weight"]).T,
            "bias": np.asarray(sd[f"embeddings.{t}.bias"]),
        }
    return {"params": params}
