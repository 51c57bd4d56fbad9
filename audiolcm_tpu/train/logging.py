"""Sample logging during training (AudioLogger parity, `main.py:356-530`).

Every `batch_frequency` steps the reference renders mel grids to
TensorBoard and vocodes a few samples to disk. Here: mels are saved as .npy
plus vocoded wavs under <logdir>/audio/<split>_gs-<step>/, no TB
dependency (metrics ride the JSONL logger); melvmin/melvmax clamping kept
for the saved arrays.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


class AudioSampleLogger:
    def __init__(
        self,
        logdir: str,
        vocode_fn: Optional[Callable] = None,  # (B, T, 80) mel -> (B, T_wav)
        sample_rate: int = 16000,
        max_items: int = 8,
        melvmin: float = -5.0,
        melvmax: float = 1.5,
    ):
        self.root = os.path.join(logdir, "audio")
        self.vocode_fn = vocode_fn
        self.sample_rate = sample_rate
        self.max_items = max_items
        self.melvmin = melvmin
        self.melvmax = melvmax

    def __call__(self, mels_btc: np.ndarray, step: int, split: str = "train",
                 names=None) -> str:
        """mels_btc: (B, T, 80). Returns the output directory."""
        outdir = os.path.join(self.root, f"{split}_gs-{step:09d}")
        os.makedirs(outdir, exist_ok=True)
        mels = np.asarray(mels_btc)[: self.max_items]
        clipped = np.clip(mels, self.melvmin, self.melvmax)
        for i, mel in enumerate(clipped):
            name = names[i] if names else f"sample_{i}"
            np.save(os.path.join(outdir, f"{name}.npy"), mel.T)  # (80, T) like ref
        if self.vocode_fn is not None:
            from audiolcm_tpu.api import _write_wav

            wavs = np.asarray(self.vocode_fn(mels))
            for i, wav in enumerate(wavs):
                name = names[i] if names else f"sample_{i}"
                _write_wav(
                    os.path.join(outdir, f"{name}.wav"), wav, self.sample_rate
                )
        return outdir
