"""Checkpoint/resume via orbax.

Behavior parity (SURVEY.md §5.4): Lightning ModelCheckpoint semantics —
top-k retention by a monitored metric (e.g. 'epoch' max / 'val/rec_loss'
min, configs/*.yaml), periodic step checkpoints, a 'last' checkpoint saved
on exception or SIGUSR1 ("melk", main.py:793-809), and resume-from-logdir.
Partial/strict=False loads are natural here: restore returns a pytree and
callers graft what they need (cf. `ddpm.py:185-201` ignore_keys loads).
"""

from __future__ import annotations

import os
import signal
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        monitor: Optional[str] = None,
        mode: str = "min",
        save_interval_steps: int = 1,
    ):
        os.makedirs(directory, exist_ok=True)
        self.directory = os.path.abspath(directory)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            best_fn=(lambda m: m[monitor]) if monitor else None,
            best_mode=mode if monitor else "min",
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> bool:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        return bool(saved)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class PreemptionSaver:
    """SIGUSR1 -> checkpoint-now flag (the reference's 'melk' handler,
    main.py:793-809); the train loop polls `should_save` between steps."""

    def __init__(self):
        self._flag = False
        try:
            signal.signal(signal.SIGUSR1, self._handler)
        except ValueError:
            pass  # not in main thread (tests)

    def _handler(self, signum, frame):
        self._flag = True

    @property
    def should_save(self) -> bool:
        return self._flag

    def clear(self):
        self._flag = False
