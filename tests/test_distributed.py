"""Real two-process distributed test (VERDICT round-1 #5).

Launches two OS processes joined via jax.distributed.initialize (1 CPU
device each), asserts the DDP loader shards are disjoint and cover the
dataset (`joinaudiodataset_anylen.py:130-168` parity), and that one global
LCM-distillation step computes the SAME loss on both processes — and the
same loss as a single-process run over the identical global batch on a
2-device virtual mesh."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_manifest(tmp_path):
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        t = 70 + 10 * i
        path = mel_dir / f"m{i}.npy"
        np.save(path, rng.standard_normal((8, t)).astype(np.float32))
        rows.append({"name": f"clip{i}", "dataset": "test",
                     "ori_cap": f"caption {i}", "caption": f"<caption {i}& all>",
                     "mel_path": str(path), "audio_path": f"/none/{i}.wav",
                     "duration": t / 62.5})
    pd.DataFrame(rows).to_csv(tmp_path / "data.tsv", sep="\t", index=False)


def _single_process_loss():
    """Same global step as the workers, on a 2-device virtual CPU mesh."""
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.nn.embeddings import guidance_scale_embedding
    from audiolcm_tpu.parallel import form_global_batch, make_mesh, replicated
    from audiolcm_tpu.train.lcm_distill import (
        Batch,
        LCMDistillConfig,
        init_train_state,
        make_lcm_distill_step,
    )

    mesh = make_mesh(2)
    model = ConcatDiT2MLP(in_channels=4, context_dim=16, hidden_size=32,
                          depth=2, num_heads=4, max_len=64)
    rng = jax.random.PRNGKey(0)
    latent_len, ctx_len = 16, 6
    teacher = model.init(
        rng, jnp.zeros((1, latent_len, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, ctx_len, 16)),
        guidance_scale_embedding(jnp.zeros((1,)), 256),
    )["params"]
    cfg = LCMDistillConfig()
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    step = make_lcm_distill_step(
        lambda p, x, t, c, w: model.apply({"params": p}, x, t, c, w),
        NoiseSchedule.linear(), cfg,
    )
    z_g = jax.random.normal(jax.random.PRNGKey(1), (4, latent_len, 4))
    c_g = jax.random.normal(jax.random.PRNGKey(2), (4, ctx_len, 16))
    batch = form_global_batch(Batch(z=np.asarray(z_g), context=np.asarray(c_g)),
                              mesh)
    uncond = jax.device_put(jnp.zeros((1, ctx_len, 16)), replicated(mesh))
    with mesh:
        _, metrics = jax.jit(step)(state, teacher, batch, uncond, rng)
    return float(metrics["train/loss"])


def test_two_process_distributed_training(tmp_path):
    _make_manifest(tmp_path)
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # each process must see exactly ONE local CPU device
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    script = os.path.join(HERE, "distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(r), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for r in range(2):
        with open(tmp_path / f"proc{r}.json") as f:
            results.append(json.load(f))

    # DDP sampler parity: disjoint shards covering every sample exactly once
    names0, names1 = set(results[0]["names"]), set(results[1]["names"])
    assert names0.isdisjoint(names1)
    assert len(names0 | names1) == 12
    assert len(results[0]["names"]) + len(results[1]["names"]) == 12

    # both processes computed the SAME global loss (single-controller SPMD)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    # and it matches the single-process run over the identical global batch
    assert results[0]["loss"] == pytest.approx(_single_process_loss(), abs=1e-4)
