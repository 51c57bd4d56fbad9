"""e2e test of the standalone vocoder inference CLIs
(`cli/vocoder_infer.py` — parity with `vocoder/bigvgan/inference.py` and
`inference_e2e.py`): both modes produce int16 wavs with the reference's
output naming, from both checkpoint layouts."""

import json

import numpy as np
import pytest
import yaml

from audiolcm_tpu.cli import vocoder_infer
from audiolcm_tpu.models.bigvgan import BigVGANConfig


VOC_ARGS = {
    "num_mels": 8, "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
    "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]], "activation": "snakebeta",
    "snake_logscale": True, "resblock": "1",
    "sampling_rate": 16000, "n_fft": 64, "win_size": 64, "hop_size": 8,
    "fmin": 125, "fmax": 7600,
}


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    import torch

    from tests.test_convert import _synthetic_bigvgan_sd

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),))
    d = tmp_path_factory.mktemp("voc")
    sd = {k: torch.from_numpy(v * 0.05)
          for k, v in _synthetic_bigvgan_sd(cfg).items()}
    torch.save({"generator": sd}, d / "best_netG.pt")
    with open(d / "args.yml", "w") as f:
        yaml.safe_dump(VOC_ARGS, f)
    return d


def test_mel_dir_mode(voc_dir, tmp_path):
    mels = tmp_path / "mels"
    mels.mkdir()
    rng = np.random.default_rng(0)
    for name, t in (("a", 12), ("b", 16)):
        np.save(mels / f"{name}.npy",
                rng.standard_normal((8, t)).astype(np.float32))
    (mels / "ignored.txt").write_text("not a mel")
    out = tmp_path / "out"
    vocoder_infer.main(["--input_mels_dir", str(mels),
                        "--output_dir", str(out),
                        "--checkpoint_file", str(voc_dir)])
    from scipy.io import wavfile

    for name, t in (("a", 12), ("b", 16)):
        sr, wav = wavfile.read(out / f"{name}_generated_e2e.wav")
        assert sr == 16000 and wav.dtype == np.int16
        assert wav.shape == (t * 4 * 2,)  # upsample_rates prod


def test_wav_dir_mode_and_file_checkpoint(voc_dir, tmp_path):
    # reference-style layout: a generator file with sibling config.json
    import shutil

    ckpt_dir = tmp_path / "g"
    ckpt_dir.mkdir()
    shutil.copy(voc_dir / "best_netG.pt", ckpt_dir / "g_05000000.pt")
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(VOC_ARGS, f)

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    from scipy.io import wavfile

    rng = np.random.default_rng(1)
    raw = (rng.standard_normal(400) * 3000).astype(np.int16)
    wavfile.write(wavs / "clip.wav", 16000, raw)

    out = tmp_path / "outw"
    vocoder_infer.main(["--input_wavs_dir", str(wavs),
                        "--output_dir", str(out),
                        "--checkpoint_file", str(ckpt_dir / "g_05000000.pt")])
    sr, wav = wavfile.read(out / "clip_generated.wav")
    assert sr == 16000 and wav.dtype == np.int16
    # mel frames (center=False, n_fft=64 hop=8 after (64-8)/2 reflect pad)
    # -> T*8 output samples
    assert wav.ndim == 1 and wav.size > 0


def test_mel_log_base_e_matches_reference_compression():
    """MelConfig(log_base="e") reproduces meldataset.py's natural-log
    dynamic range compression (the wav-mode mel path)."""
    import jax.numpy as jnp

    from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram

    y = jnp.asarray(np.random.default_rng(2).standard_normal((1, 512))
                    .astype(np.float32) * 0.1)
    m10 = MelSpectrogram(MelConfig(n_fft=64, win_size=64, hop_size=8,
                                   n_mels=8, log_base="10"))(y)
    me = MelSpectrogram(MelConfig(n_fft=64, win_size=64, hop_size=8,
                                  n_mels=8, log_base="e"))(y)
    np.testing.assert_allclose(np.asarray(me), np.asarray(m10) * np.log(10.0),
                               rtol=1e-5, atol=1e-5)
