"""TensorBoard logging parity (train/logging.py, main.py:452-530,634-658)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.train.logging import AudioSampleLogger, TensorBoardLogger


def _read_events(tb_dir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tb_dir), size_guidance={
        "scalars": 0, "images": 0, "audio": 0})
    acc.Reload()
    return acc


def test_tensorboard_scalars_and_samples(tmp_path):
    tb = TensorBoardLogger(str(tmp_path / "tb"))
    assert tb.active
    tb.scalars(10, {"train/loss": 1.5, "train/kl": 0.25, "names": ["skip"]})
    tb.scalars(20, {"train/loss": 1.0})

    rng = np.random.default_rng(0)
    logger = AudioSampleLogger(
        str(tmp_path), vocode_fn=lambda m: np.tanh(m[..., :1].repeat(4, -1)
                                                   .reshape(m.shape[0], -1)),
        max_items=2, tb=tb,
    )
    mels = rng.standard_normal((3, 16, 8)).astype(np.float32)
    outdir = logger(mels, step=10, split="val")
    tb.close()

    # .npy/.wav artifacts still written (dependency-free path)
    assert sorted(f for f in os.listdir(outdir) if f.endswith(".npy")) == [
        "sample_0.npy", "sample_1.npy"]
    assert sorted(f for f in os.listdir(outdir) if f.endswith(".wav")) == [
        "sample_0.wav", "sample_1.wav"]

    acc = _read_events(tmp_path / "tb")
    assert set(acc.Tags()["scalars"]) == {"train/loss", "train/kl"}
    assert [(s.step, s.value) for s in acc.Scalars("train/loss")] == [
        (10, 1.5), (20, 1.0)]
    assert any("val/mel_sample_0" in t for t in acc.Tags()["images"])
    assert any("val/audio_sample_0" in t for t in acc.Tags()["audio"])


def test_trainer_writes_tb_scalars(tmp_path):
    from audiolcm_tpu.train.loop import Trainer

    def step_fn(state, batch, rng):
        return state + 1, {"train/loss": 2.0 / (state + 1)}

    trainer = Trainer(step_fn, state=jnp.zeros(()), logdir=str(tmp_path),
                      log_every=1)
    trainer.fit(lambda e: iter([{"x": 1}, {"x": 2}]), num_epochs=1,
                rng=jax.random.PRNGKey(0))

    acc = _read_events(tmp_path / "tb")
    tags = set(acc.Tags()["scalars"])
    assert "train/loss" in tags
    assert "epoch_time_s" in tags  # epoch metrics mirrored too


def test_tensorboard_logger_disabled_is_noop(tmp_path):
    tb = TensorBoardLogger(str(tmp_path / "tb"), enabled=False)
    assert not tb.active
    tb.scalars(0, {"a": 1.0})
    tb.mel_image("m", np.zeros((8, 8)), 0)
    tb.audio("a", np.zeros(16), 0)
    tb.flush()
    tb.close()
    assert not os.path.exists(tmp_path / "tb")


def test_wandb_logger_degrades_loudly(tmp_path, capsys):
    """wandb is not installed in this environment: WandbLogger must become a
    no-op AND say so on stdout (Weak r2 #5: silent observability loss)."""
    from audiolcm_tpu.train.logging import WandbLogger

    wl = WandbLogger(str(tmp_path / "wb"))
    out = capsys.readouterr().out
    assert not wl.active
    assert "WARNING" in out and "wandb" in out
    # full interface is safe as a no-op
    wl.scalars(0, {"a": 1.0})
    wl.mel_image("m", np.zeros((8, 8)), 0)
    wl.audio("a", np.zeros(16), 0)
    wl.flush()
    wl.close()


def test_make_logger_dispatch_and_unknown_backend(tmp_path, capsys):
    from audiolcm_tpu.train.logging import (
        TensorBoardLogger as TBL,
        WandbLogger,
        make_logger,
    )

    assert isinstance(make_logger("tensorboard", str(tmp_path / "a")), TBL)
    assert isinstance(make_logger("wandb", str(tmp_path / "b")), WandbLogger)
    capsys.readouterr()
    lg = make_logger("mysterious", str(tmp_path / "c"))
    assert isinstance(lg, TBL)
    assert "unknown logger backend" in capsys.readouterr().out
