"""Integration tests for the inference CLIs (reference-flag parity).

Covers `cli/txt2audio_for_lcm.py` (prompt-txt mode, test-dataset mode with
result.csv + `{name}_sample_{num}_{idx}.wav` naming, and the teacher
DDIM/PLMS path — reference `scripts/txt2audio_for_lcm.py:240-262`,
`scripts/txt2audio_for_2cap.py:227-229`) and `cli/reconstruct_audio.py`
(reference `scripts/reconstruct_audio.py:115-167`: dataset-driven VAE
round-trip, vocoded wavs, MSE report).

Uses the synthetic reference-format checkpoint fixture from test_api.
"""

import os

import numpy as np
import pytest
import yaml

# importing the fixture function registers it for this module too
from tests.test_api import StubTokenizers, synthetic_ckpt  # noqa: F401


def _stub_tokenizers(monkeypatch):
    import audiolcm_tpu.api as api

    monkeypatch.setattr(api, "Tokenizers", lambda *a, **k: StubTokenizers())


def _write_tiny_tsv(tmp_path, with_mels=False, num_mels=8, crop_len=16):
    rows = []
    names = ["dog", "dog", "cat"]
    caps = ["a dog barks", "a dog howls", "a cat meows"]
    rng = np.random.default_rng(0)
    for i, (name, cap) in enumerate(zip(names, caps)):
        mel_path = ""
        if with_mels:
            mel = (rng.standard_normal((num_mels, crop_len - 2 + i)) * 0.1).astype(
                np.float32
            )
            mel_path = str(tmp_path / f"mel_{i}.npy")
            np.save(mel_path, mel)
        rows.append(
            f"{name}\taudiocaps\t{cap}\t{mel_path}\t<{cap}& all>\t/dev/null"
        )
    tsv = tmp_path / "test.tsv"
    tsv.write_text(
        "name\tdataset\tori_cap\tmel_path\tcaption\taudio_path\n" + "\n".join(rows) + "\n"
    )
    return str(tsv)


def _config_with_dataset(cfg_path, tsv_path, tmp_path, crop_len=16):
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["test_dataset"] = {
        "target": "ldm.data.tsvdataset.TSVDatasetStruct",
        "params": {"tsv_path": tsv_path, "spec_crop_len": crop_len},
    }
    out = tmp_path / "cfg_with_ds.yaml"
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(out)


def test_txt2audio_prompt_mode(synthetic_ckpt, tmp_path, monkeypatch):
    _stub_tokenizers(monkeypatch)
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    ptxt = tmp_path / "prompt.txt"
    ptxt.write_text("a dog barks\nrain falls\nwind blows\n")
    outdir = tmp_path / "out"
    from audiolcm_tpu.cli.txt2audio_for_lcm import main

    main([
        "--prompt_txt", str(ptxt), "-b", cfg_path, "-r", ckpt_path,
        "--vocoder-ckpt", voc_dir, "--outdir", str(outdir),
        "--W", "8", "--batch_size", "2",
    ])
    wavs = sorted(f for f in os.listdir(outdir) if f.endswith(".wav"))
    assert wavs == ["a-dog-barks_0.wav", "rain-falls_0.wav", "wind-blows_0.wav"]
    from scipy.io import wavfile

    sr, wav = wavfile.read(outdir / wavs[0])
    assert sr == 16000 and wav.shape == (128,)  # latent 8 -> mel 16 -> wav 16*8


def test_txt2audio_dataset_mode_result_csv(synthetic_ckpt, tmp_path, monkeypatch):
    """Reference naming: duplicate TSV names get _{n}, wavs are
    {name}_sample_{num}_{idx}.wav, result.csv is tab-separated."""
    _stub_tokenizers(monkeypatch)
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    tsv = _write_tiny_tsv(tmp_path)
    cfg_ds = _config_with_dataset(cfg_path, tsv, tmp_path)
    outdir = tmp_path / "out"
    from audiolcm_tpu.cli.txt2audio_for_lcm import main

    main([
        "--test-dataset", "audiocaps", "-b", cfg_ds, "-r", ckpt_path,
        "--vocoder-ckpt", voc_dir, "--outdir", str(outdir),
        "--W", "8", "--batch_size", "2", "--n_samples", "2",
    ])
    wavs = sorted(f for f in os.listdir(outdir) if f.endswith(".wav"))
    assert wavs == [
        "cat_sample_0_0.wav", "cat_sample_0_1.wav",
        "dog_sample_0_0.wav", "dog_sample_0_1.wav",
        "dog_sample_1_0.wav", "dog_sample_1_1.wav",
    ]
    import pandas as pd

    df = pd.read_csv(outdir / "result.csv", sep="\t")
    assert list(df.columns) == ["caption", "audio_path"]
    assert len(df) == 6
    assert set(df["caption"]) == {"a dog barks", "a dog howls", "a cat meows"}
    for p in df["audio_path"]:
        assert os.path.exists(p)


@pytest.mark.parametrize("plms", [False, True])
def test_txt2audio_teacher_path(synthetic_ckpt, tmp_path, monkeypatch, plms):
    _stub_tokenizers(monkeypatch)
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    ptxt = tmp_path / "prompt.txt"
    ptxt.write_text("thunder rolls\n")
    outdir = tmp_path / "out"
    from audiolcm_tpu.cli.txt2audio_for_lcm import main

    args = [
        "--prompt_txt", str(ptxt), "-b", cfg_path, "-r", ckpt_path,
        "--vocoder-ckpt", voc_dir, "--outdir", str(outdir),
        "--W", "8", "--batch_size", "1", "--ddim_steps", "4", "--teacher",
    ]
    if plms:
        args.append("--plms")
    main(args)
    from scipy.io import wavfile

    sr, wav = wavfile.read(outdir / "thunder-rolls_0.wav")
    assert sr == 16000 and wav.shape == (128,)
    assert np.all(np.isfinite(wav))


def test_reconstruct_audio_cli(synthetic_ckpt, tmp_path, capsys):
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    tsv = _write_tiny_tsv(tmp_path, with_mels=True)
    cfg_ds = _config_with_dataset(cfg_path, tsv, tmp_path)
    outdir = tmp_path / "recon"
    from audiolcm_tpu.cli.reconstruct_audio import main

    main([
        "-b", cfg_ds, "-r", ckpt_path, "--vocoder-ckpt", voc_dir,
        "--outdir", str(outdir), "--batch_size", "2", "--save_mel",
    ])
    out = capsys.readouterr().out
    assert "test/mse_loss:" in out
    wavs = sorted(f for f in os.listdir(outdir) if f.endswith(".wav"))
    assert wavs == ["cat_0.wav", "dog_0.wav", "dog_1.wav"]
    mels = sorted(f for f in os.listdir(outdir) if f.endswith(".npy"))
    assert len(mels) == 3
    rec = np.load(outdir / mels[0])
    assert rec.shape == (8, 16)  # (num_mels, spec_crop_len), reference layout
    from scipy.io import wavfile

    sr, wav = wavfile.read(outdir / wavs[0])
    assert sr == 16000 and wav.shape == (128,)
