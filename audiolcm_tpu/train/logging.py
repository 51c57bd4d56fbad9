"""Sample + TensorBoard logging during training (AudioLogger parity).

Every `batch_frequency` steps the reference renders mel figures and vocoded
audio to TensorBoard (`main.py:452-530`) next to its scalar loggers
(`main.py:634-658`). Here both live: mels are saved as .npy plus vocoded
wavs under <logdir>/audio/<split>_gs-<step>/ (always, dependency-free), and
TensorBoardLogger mirrors scalars/mel-figures/audio into event files when
tensorboardX+matplotlib are importable (no-op otherwise). melvmin/melvmax
clamping kept for both paths.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


class TensorBoardLogger:
    """Event-file logging: scalars, mel figures (melvmin/vmax color scale),
    audio. Degrades to a no-op when tensorboardX is unavailable."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.writer = None
        if not enabled:
            return
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(logdir)
        except Exception:
            self.writer = None

    @property
    def active(self) -> bool:
        return self.writer is not None

    def scalars(self, step: int, metrics: dict) -> None:
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def mel_image(self, tag: str, mel_ct: np.ndarray, step: int,
                  vmin: float = -5.0, vmax: float = 1.5) -> None:
        """mel_ct: (n_mels, T). Rendered like the reference's mel figures
        (main.py:465-480): origin-low spectrogram with a colorbar."""
        if self.writer is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        im = ax.imshow(np.asarray(mel_ct), origin="lower", aspect="auto",
                       vmin=vmin, vmax=vmax, interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("frames")
        ax.set_ylabel("mel bins")
        self.writer.add_figure(tag, fig, step, close=True)

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sample_rate: int = 16000) -> None:
        if self.writer is None:
            return
        # tensorboardX's add_audio requires the absent soundfile package;
        # build the audio Summary proto ourselves with a scipy wav encode
        import io

        from scipy.io import wavfile
        from tensorboardX.proto.summary_pb2 import Summary

        wav = np.clip(np.asarray(wav, dtype=np.float32).reshape(-1), -1.0, 1.0)
        buf = io.BytesIO()
        wavfile.write(buf, sample_rate, (wav * 32767.0).astype(np.int16))
        audio = Summary.Audio(
            sample_rate=sample_rate, num_channels=1, length_frames=len(wav),
            encoded_audio_string=buf.getvalue(), content_type="audio/wav",
        )
        self.writer._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, audio=audio)]), step
        )

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
            self.writer = None


class AudioSampleLogger:
    def __init__(
        self,
        logdir: str,
        vocode_fn: Optional[Callable] = None,  # (B, T, 80) mel -> (B, T_wav)
        sample_rate: int = 16000,
        max_items: int = 8,
        melvmin: float = -5.0,
        melvmax: float = 1.5,
        tb: Optional[TensorBoardLogger] = None,
    ):
        self.root = os.path.join(logdir, "audio")
        self.vocode_fn = vocode_fn
        self.sample_rate = sample_rate
        self.max_items = max_items
        self.melvmin = melvmin
        self.melvmax = melvmax
        self.tb = tb

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
            if self.tb is not None:
                self.tb.mel_image(f"{split}/mel_{name}", mel.T, step,
                                  vmin=self.melvmin, vmax=self.melvmax)
        if self.vocode_fn is not None:
            from audiolcm_tpu.api import _write_wav

            wavs = np.asarray(self.vocode_fn(mels))
            for i, wav in enumerate(wavs):
                name = names[i] if names else f"sample_{i}"
                _write_wav(
                    os.path.join(outdir, f"{name}.wav"), wav, self.sample_rate
                )
                if self.tb is not None:
                    self.tb.audio(f"{split}/audio_{name}", wav, step,
                                  self.sample_rate)
        if self.tb is not None:
            self.tb.flush()
        return outdir
