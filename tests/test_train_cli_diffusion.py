"""End-to-end train-CLI integration for the diffusion paths.

Teacher LDM training (`configs/teacher.yaml` flow) and LCM consistency
distillation (`configs/audiolcm.yaml` flow) through the real CLI:
Lightning-format checkpoint loading + conversion (teacher/student/target
DiT, frozen VAE + CLAP/T5 towers), duration-bucketed loader over .npy
mels, jitted train steps, validation, metrics JSONL, orbax checkpoints —
reference `main.py:555-845` dispatch semantics.
"""

import json
import os

import numpy as np
import pytest
import yaml

from tests.test_api import StubTokenizers, synthetic_ckpt  # noqa: F401


@pytest.fixture
def diffusion_data(tmp_path):
    """TSV manifest + 8-bin mel .npys sized for the tiny synthetic model."""
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(108):  # split_dataframe: first 100 rows = val
        t = 32
        mel = (rng.standard_normal((8, t)) * 0.5).astype(np.float32)
        path = mel_dir / f"m{i}.npy"
        np.save(path, mel)
        rows.append({"name": f"c{i}", "dataset": "syn", "ori_cap": f"cap {i}",
                     "caption": f"<cap {i}& all>", "mel_path": str(path),
                     "audio_path": "/none", "duration": t / 62.5})
    import pandas as pd

    pd.DataFrame(rows).to_csv(tmp_path / "data.tsv", sep="\t", index=False)
    return str(tmp_path)


def _train_config(base_cfg_path, ckpt_path, data_root, target, tmp_path):
    with open(base_cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["target"] = target
    cfg["model"]["params"]["ckpt_path"] = ckpt_path
    cfg["data"] = {"params": {"batch_size": 2, "spec_dir_path": data_root,
                              "mel_num": 8}}
    out = tmp_path / "train_cfg.yaml"
    out.write_text(yaml.safe_dump(cfg))
    return str(out)


def _run_and_check(cfg_path, logroot, monkeypatch, val_key):
    import audiolcm_tpu.api as api

    monkeypatch.setattr(api, "Tokenizers", lambda *a, **k: StubTokenizers())
    from audiolcm_tpu.cli.train import main

    main(["-b", cfg_path, "-t", "--max_epochs", "1", "-l", logroot])
    runs = os.listdir(logroot)
    assert len(runs) == 1
    rundir = os.path.join(logroot, runs[0])
    lines = [json.loads(l) for l in open(os.path.join(rundir, "metrics.jsonl"))]
    # tiny epochs are shorter than log_every, so the epoch summary line
    # (epoch time + validation_step-parity losses) is the contract here
    epoch_lines = [l for l in lines if "epoch_time_s" in l]
    assert epoch_lines
    assert np.isfinite(epoch_lines[-1][val_key])
    assert os.listdir(os.path.join(rundir, "checkpoints"))


def test_teacher_train_cli_end_to_end(synthetic_ckpt, diffusion_data, tmp_path,
                                      monkeypatch):
    cfg_path, ckpt_path, _ = synthetic_ckpt
    cfg = _train_config(cfg_path, ckpt_path, diffusion_data,
                        "ldm.models.diffusion.ddpm_audio.LatentDiffusion_audio",
                        tmp_path)
    _run_and_check(cfg, str(tmp_path / "logs"), monkeypatch, "val/loss_simple")


def test_lcm_train_cli_end_to_end(synthetic_ckpt, diffusion_data, tmp_path,
                                  monkeypatch):
    cfg_path, ckpt_path, _ = synthetic_ckpt
    cfg = _train_config(cfg_path, ckpt_path, diffusion_data,
                        "ldm.models.diffusion.lcm_audio.LCM_audio", tmp_path)
    _run_and_check(cfg, str(tmp_path / "logs"), monkeypatch, "val/loss")
