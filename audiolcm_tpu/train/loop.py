"""Generic training loop harness.

Replaces the reference's pytorch-lightning Trainer (`main.py:555-845`)
with an explicit loop:
  * LR scaling lr = accumulate * nhosts*ndevices * batch_size * base_lr
    (`main.py:781-788`)
  * per-epoch wall-time + device peak-memory metrics reduced over the mesh
    (CUDACallback parity, `main.py:532-552`)
  * checkpoint-on-exception and SIGUSR1 checkpoint (SetupCallback /
    'melk' parity, `main.py:318-322,793-809`)
  * metric logging to JSONL (+stdout); pluggable sample-logging callback
    slot (AudioLogger parity lives in train/logging.py)
  * validation every epoch via a val_fn hook

The step function itself is jitted by the caller (each trainer module
provides one); the loop only does host-side orchestration.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax

from audiolcm_tpu.train.checkpoints import CheckpointManager, PreemptionSaver


def scale_learning_rate(base_lr: float, batch_size: int, num_devices: int,
                        accumulate: int = 1) -> float:
    """`main.py:781-788` semantics."""
    return accumulate * num_devices * batch_size * base_lr


class MetricsLogger:
    def __init__(self, logdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._fh = open(self.path, "a")

    def log(self, step: int, metrics: dict) -> None:
        record = {"step": int(step)}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


def device_peak_memory_bytes() -> Optional[int]:
    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if stats:
        return stats.get("peak_bytes_in_use")
    return None


class Trainer:
    def __init__(
        self,
        step_fn: Callable,  # (state, batch, rng) -> (state, metrics)
        state: Any,
        logdir: str,
        checkpoints: Optional[CheckpointManager] = None,
        val_fn: Optional[Callable] = None,  # (state, epoch) -> dict
        sample_logger: Optional[Callable] = None,  # (state, step) -> None
        log_every: int = 50,
        sample_every: int = 5000,
        checkpoint_every_steps: int = 10000,
        tensorboard: bool = True,
        logger: str = "tensorboard",
    ):
        self.step_fn = step_fn
        self.state = state
        self.logdir = logdir
        self.metrics = MetricsLogger(logdir)
        # scalar mirror of the reference's logger dispatch (main.py:634-658):
        # tensorboard (default) or wandb; loud no-op when the backend package
        # is unavailable
        from audiolcm_tpu.train.logging import make_logger

        self.tb = make_logger(logger, os.path.join(logdir, "tb"),
                              enabled=tensorboard)
        self.checkpoints = checkpoints
        self.val_fn = val_fn
        self.sample_logger = sample_logger
        self.log_every = log_every
        self.sample_every = sample_every
        self.checkpoint_every_steps = checkpoint_every_steps
        self.preemption = PreemptionSaver()
        self.global_step = 0

    def _save(self, metrics: Optional[dict] = None):
        if self.checkpoints is not None:
            self.checkpoints.save(self.global_step, self.state, metrics)

    def fit(
        self,
        loader_factory: Callable[[int], Iterable],  # epoch -> iterable of batches
        num_epochs: int,
        rng: jax.Array,
    ):
        try:
            for epoch in range(num_epochs):
                t0 = time.time()
                last_metrics: dict = {}
                for batch in loader_factory(epoch):
                    rng, step_rng = jax.random.split(rng)
                    self.state, metrics = self.step_fn(self.state, batch, step_rng)
                    self.global_step += 1
                    last_metrics = metrics
                    if self.global_step % self.log_every == 0:
                        self.metrics.log(self.global_step, metrics)
                        self.tb.scalars(self.global_step, metrics)
                    if self.sample_logger and self.global_step % self.sample_every == 0:
                        self.sample_logger(self.state, self.global_step)
                    if self.global_step % self.checkpoint_every_steps == 0:
                        self._save(metrics)
                    if self.preemption.should_save:
                        self._save(metrics)
                        self.preemption.clear()
                epoch_metrics = {
                    "epoch": epoch,
                    "epoch_time_s": time.time() - t0,
                }
                peak = device_peak_memory_bytes()
                if peak is not None:
                    epoch_metrics["peak_memory_mb"] = peak / 2**20
                if self.val_fn is not None:
                    epoch_metrics.update(self.val_fn(self.state, epoch))
                self.metrics.log(self.global_step, epoch_metrics)
                self.tb.scalars(self.global_step, epoch_metrics)
                self._save({**last_metrics, **epoch_metrics})
        except BaseException:
            # SetupCallback.on_exception parity: save 'last' before dying
            self._save()
            raise
        finally:
            self.tb.close()
            if self.checkpoints is not None:
                self.checkpoints.wait()
