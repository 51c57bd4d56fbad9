"""Trainer harness tests: checkpoints, metrics, loop, LR scaling."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.train.checkpoints import CheckpointManager
from audiolcm_tpu.train.loop import MetricsLogger, Trainer, scale_learning_rate


def test_scale_learning_rate():
    # main.py:781-785: lr = accum * ngpu * bs * base_lr; reference default
    # 8 gpus x bs 8 x 3e-6
    assert abs(scale_learning_rate(3e-6, 8, 8) - 1.92e-4) < 1e-12


def test_checkpoint_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(3)}
    assert mgr.save(1, state)
    mgr.wait()
    restored = mgr.restore(template=jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))
    assert mgr.latest_step() == 1
    mgr.close()


def test_checkpoint_top_k_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = {"w": jnp.zeros(2)}
    for step in (1, 2, 3):
        mgr.save(step, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    mgr.close()


def test_trainer_loop_runs_and_checkpoints(tmp_path):
    # trivial quadratic descent as the "training step"
    def step_fn(state, batch, rng):
        w = state["w"] - 0.1 * (state["w"] - batch)
        return {"w": w}, {"train/loss": jnp.mean((w - batch) ** 2)}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(
        step_fn, {"w": jnp.zeros(())}, str(tmp_path), checkpoints=mgr,
        log_every=1, checkpoint_every_steps=100,
    )
    loader = lambda epoch: [jnp.asarray(1.0)] * 5
    trainer.fit(loader, num_epochs=2, rng=jax.random.PRNGKey(0))
    assert trainer.global_step == 10
    assert float(trainer.state["w"]) > 0.5
    # metrics file written
    lines = [json.loads(l) for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
    assert any("epoch_time_s" in l for l in lines)
    mgr.wait()
    assert mgr.latest_step() is not None
    mgr.close()


def test_trainer_saves_on_exception(tmp_path):
    calls = []

    def step_fn(state, batch, rng):
        if len(calls) >= 2:
            raise RuntimeError("boom")
        calls.append(1)
        return state, {}

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(step_fn, {"w": jnp.zeros(())}, str(tmp_path), checkpoints=mgr)
    with pytest.raises(RuntimeError):
        trainer.fit(lambda e: [1, 2, 3, 4], num_epochs=1, rng=jax.random.PRNGKey(0))
    mgr.wait()
    assert mgr.latest_step() is not None  # 'last' saved before dying
    mgr.close()
