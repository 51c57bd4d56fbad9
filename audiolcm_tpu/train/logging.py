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
        except Exception as e:
            # LOUD one-liner: a long run silently losing all TB observability
            # is worse than the import failure itself
            print(f"WARNING: TensorBoard logging disabled — tensorboardX "
                  f"unavailable ({type(e).__name__}: {e}); training metrics "
                  f"will only reach metrics.jsonl", flush=True)
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
        # _get_file_writer is tensorboardX-private but unavoidable: the public
        # add_audio hard-requires the absent soundfile package. Guard against
        # the API moving under us and fall back to add_audio (which will warn
        # below rather than crash training).
        fw = getattr(self.writer, "_get_file_writer", None)
        if fw is not None:
            fw().add_summary(
                Summary(value=[Summary.Value(tag=tag, audio=audio)]), step
            )
            return
        try:
            self.writer.add_audio(tag, wav, step, sample_rate=sample_rate)
        except Exception as e:
            print(f"WARNING: TB audio summary for {tag!r} dropped "
                  f"({type(e).__name__}: {e})", flush=True)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
            self.writer = None


class WandbLogger:
    """Weights & Biases backend with the TensorBoardLogger interface.

    Parity: `main.py:634-658` offers a WandbLogger config block next to the
    TB/testtube default. Guarded import — wandb is not shipped in this
    environment, so construction degrades to a LOUD no-op (same contract as
    TensorBoardLogger without tensorboardX)."""

    def __init__(self, logdir: str, enabled: bool = True,
                 project: str = "audiolcm_tpu", name: Optional[str] = None):
        self.run = None
        self._wandb = None
        if not enabled:
            return
        try:
            import wandb

            self._wandb = wandb
            self.run = wandb.init(
                project=project, name=name or os.path.basename(logdir),
                dir=logdir, id=(name or os.path.basename(logdir)),
            )
        except Exception as e:
            print(f"WARNING: wandb logging disabled — wandb unavailable "
                  f"({type(e).__name__}: {e}); training metrics will only "
                  f"reach metrics.jsonl", flush=True)
            self.run = None

    @property
    def active(self) -> bool:
        return self.run is not None

    def scalars(self, step: int, metrics: dict) -> None:
        if self.run is None:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                pass
        if clean:
            self.run.log(clean, step=step)

    def mel_image(self, tag: str, mel_ct: np.ndarray, step: int,
                  vmin: float = -5.0, vmax: float = 1.5) -> None:
        if self.run is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        im = ax.imshow(np.asarray(mel_ct), origin="lower", aspect="auto",
                       vmin=vmin, vmax=vmax, interpolation="none")
        fig.colorbar(im, ax=ax)
        self.run.log({tag: self._wandb.Image(fig)}, step=step)
        plt.close(fig)

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sample_rate: int = 16000) -> None:
        if self.run is None:
            return
        wav = np.clip(np.asarray(wav, dtype=np.float32).reshape(-1), -1.0, 1.0)
        self.run.log(
            {tag: self._wandb.Audio(wav, sample_rate=sample_rate)}, step=step)

    def flush(self) -> None:
        pass  # wandb streams asynchronously

    def close(self) -> None:
        if self.run is not None:
            self.run.finish()
            self.run = None


def make_logger(backend: str, logdir: str, enabled: bool = True):
    """Logger factory mirroring the reference's logger-config dispatch
    (`main.py:634-658`): "tensorboard" (default) or "wandb". An unknown
    backend warns loudly and falls back to TensorBoard rather than silently
    dropping observability."""
    if backend == "wandb":
        return WandbLogger(logdir, enabled=enabled)
    if backend not in ("tensorboard", "testtube", ""):
        print(f"WARNING: unknown logger backend {backend!r}; "
              f"falling back to tensorboard", flush=True)
    return TensorBoardLogger(logdir, enabled=enabled)


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
