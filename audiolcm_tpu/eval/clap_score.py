"""CLAP-score evaluation harness.

Behavior parity: `wav_evaluation/cal_clap_score.py` + `models/CLAPWrapper.py`:
generated wavs are resampled to 44.1 kHz, repeat-padded/cropped to the CLAP
duration (5 s), embedded with Cnn14+projection; captions are embedded with
BERT CLS + projection; score = mean of the diagonal cosine similarities,
computed in batches of 60. Documented ground-truth anchor: AudioCaps val
GT CLAP = 0.479077 (`cal_clap_score.py:21`).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np


def prepare_clap_audio(
    wav_16k: np.ndarray, target_sr: int = 44100, source_sr: int = 16000,
    duration_s: float = 5.0,
) -> np.ndarray:
    """Resample + repeat-pad/crop to the CLAP window (CLAPWrapper semantics)."""
    from scipy.signal import resample_poly

    g = np.gcd(source_sr, target_sr)
    wav = resample_poly(wav_16k, target_sr // g, source_sr // g).astype(np.float32)
    target_len = int(duration_s * target_sr)
    if len(wav) >= target_len:
        return wav[:target_len]
    reps = -(-target_len // len(wav))
    return np.tile(wav, reps)[:target_len]


def cosine_diag(text_emb: jnp.ndarray, audio_emb: jnp.ndarray) -> jnp.ndarray:
    """Per-pair cosine similarity of matched (text, audio) rows."""
    t = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    a = audio_emb / jnp.linalg.norm(audio_emb, axis=-1, keepdims=True)
    return jnp.sum(t * a, axis=-1)


def clap_score(
    text_embed_fn: Callable[[List[str]], jnp.ndarray],
    audio_embed_fn: Callable[[np.ndarray], jnp.ndarray],
    captions: List[str],
    wavs: List[np.ndarray],
    batch_size: int = 60,
) -> float:
    """Mean diagonal cosine over the dataset (batches of 60,
    `cal_clap_score.py:46-58`)."""
    assert len(captions) == len(wavs)
    scores = []
    for i in range(0, len(captions), batch_size):
        caps = captions[i : i + batch_size]
        batch_wavs = np.stack([prepare_clap_audio(w) for w in wavs[i : i + batch_size]])
        t_emb = text_embed_fn(caps)
        a_emb = audio_embed_fn(batch_wavs)
        scores.append(np.asarray(cosine_diag(t_emb, a_emb)))
    return float(np.concatenate(scores).mean())


def add_clap_score_to_csv(csv_path: str, scores: List[float], out_path: Optional[str] = None):
    """`cal_clap_score.py:60-70` parity: append a clap_score column."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    df["clap_score"] = scores
    df.to_csv(out_path or csv_path, index=False)
    return df
