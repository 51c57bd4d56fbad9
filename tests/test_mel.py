"""Golden-numerics tests for the mel DSP vs the reference equations.

The golden values are computed here with torch-cpu directly from the
documented reference math (clamp -> reflect pad -> torch.stft ->
sqrt(re^2+im^2+1e-9) -> mel matmul -> log10 clamp), NOT imported from the
reference repo. Parity target: ldm/data/preprocess/NAT_mel.py:64-85.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audiolcm_tpu.dsp import MelConfig, MelSpectrogram, mel_filterbank
from audiolcm_tpu.dsp.mel import hann_window


def _torch_reference_mel(y, cfg: MelConfig, mel_basis):
    import torch

    y = torch.from_numpy(np.asarray(y, dtype=np.float32))
    if y.ndim == 1:
        y = y[None]
    y = y.clamp(-1.0, 1.0)
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = torch.nn.functional.pad(y[:, None, :], (pad, pad), mode="reflect")[:, 0]
    window = torch.hann_window(cfg.win_size)
    spec = torch.stft(
        y,
        cfg.n_fft,
        hop_length=cfg.hop_size,
        win_length=cfg.win_size,
        window=window,
        center=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    mel = torch.matmul(torch.from_numpy(mel_basis), mag)
    return torch.log10(torch.clamp(mel, min=cfg.clip_val)).numpy()


@pytest.mark.parametrize("num_samples", [16000, 160000])
def test_mel_matches_torch_reference(rng, num_samples):
    cfg = MelConfig()
    wav = (rng.standard_normal(num_samples) * 0.3).astype(np.float32)
    melspec = MelSpectrogram(cfg)
    ours = np.asarray(melspec(jnp.asarray(wav)))
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    golden = _torch_reference_mel(wav, cfg, basis)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-3)


def test_mel_frame_count_62_5_per_sec():
    # 10 s at 16 kHz must produce 625 frames (62.5 fps, mel_spec.py:194).
    melspec = MelSpectrogram(MelConfig())
    assert melspec.num_frames(160000) == 625
    out = melspec(jnp.zeros((1, 160000)))
    assert out.shape == (1, 80, 625)


def test_mel_filterbank_matches_transformers_slaney():
    """Independent slaney-filterbank cross-check (VERDICT r3 weak #5).

    librosa (what the reference calls, NAT_mel.py:54) isn't in this env;
    transformers.audio_utils.mel_filter_bank is a separate widely-validated
    implementation of the same slaney mel scale + normalization, so it
    breaks the replica-circularity without the librosa dep. Checked at the
    generation constants (fmin 0 / fmax 8000) and the BigVGAN training
    variant (fmin 125 / fmax 7600)."""
    from transformers.audio_utils import mel_filter_bank

    for fmin, fmax in ((0.0, 8000.0), (125.0, 7600.0)):
        cfg = MelConfig(fmin=fmin, fmax=fmax)
        ours = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                              cfg.fmin, cfg.fmax)
        theirs = mel_filter_bank(
            num_frequency_bins=cfg.n_fft // 2 + 1, num_mel_filters=cfg.n_mels,
            min_frequency=cfg.fmin, max_frequency=cfg.fmax,
            sampling_rate=cfg.sample_rate, norm="slaney", mel_scale="slaney",
        ).T
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_hann_window_matches_torch():
    import torch

    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_mel_stft_matmul_matches_fft(rng):
    """MelConfig(stft_matmul=True) — the DFT-as-matmul MXU formulation
    (dsp/mel.py:stft_magnitude_matmul) — must match the rFFT path through
    the full log-mel pipeline at matmul-reassociation tolerance, value AND
    gradient (the knob targets the vocoder-GAN gen step's differentiated
    mel loss, train/vocoder_gan.py)."""
    import jax

    wav = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    fft = MelSpectrogram(MelConfig(fmin=125.0, fmax=8000.0))
    mm = MelSpectrogram(MelConfig(fmin=125.0, fmax=8000.0, stft_matmul=True))
    a = np.asarray(fft(jnp.asarray(wav)))
    b = np.asarray(mm(jnp.asarray(wav)))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)

    loss = lambda spec, w: jnp.mean(jnp.abs(spec(w)))
    ga = np.asarray(jax.grad(lambda w: loss(fft, w))(jnp.asarray(wav)))
    gb = np.asarray(jax.grad(lambda w: loss(mm, w))(jnp.asarray(wav)))
    np.testing.assert_allclose(ga, gb, atol=2e-5, rtol=1e-3)
