"""End-to-end train-CLI integration: VAE GAN training on synthetic data.

Exercises the full `python -m audiolcm_tpu.cli.train -b cfg -t` path
(main.py parity): config parsing, model/disc construction from YAML, tile
loader over real .npy mels, jitted alternating GAN steps, validation
losses, metrics JSONL, and orbax checkpointing.
"""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture
def vae_train_setup(tmp_path):
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    # 100 val rows + 8 train rows (split_dataframe: val = first 100)
    for i in range(108):
        t = 32
        mel = rng.standard_normal((16, t)).astype(np.float32)
        path = mel_dir / f"m{i}.npy"
        np.save(path, mel)
        rows.append({"name": f"c{i}", "dataset": "syn", "ori_cap": f"cap {i}",
                     "caption": f"<cap {i}& all>", "mel_path": str(path),
                     "audio_path": "/none", "duration": t / 62.5})
    import pandas as pd

    pd.DataFrame(rows).to_csv(tmp_path / "data.tsv", sep="\t", index=False)

    cfg = {
        "model": {
            "base_learning_rate": 1.0e-4,
            "target": "ldm.models.autoencoder1d.AutoencoderKL",
            "params": {
                "embed_dim": 4,
                "ddconfig": {"double_z": True, "in_channels": 16, "out_ch": 16,
                             "z_channels": 4, "kernel_size": 5, "ch": 32,
                             "ch_mult": [1, 2], "num_res_blocks": 1,
                             "attn_layers": [], "down_layers": [0],
                             "dropout": 0.0},
                "lossconfig": {
                    "target": "ldm.modules.losses_audio.contperceptual.LPAPSWithDiscriminator",
                    "params": {"disc_start": 0, "kl_weight": 1e-6,
                               "disc_weight": 0.5, "disc_in_channels": 1,
                               "disc_loss": "mse", "disc_factor": 2,
                               "r1_reg_weight": 3, "disc_hidden_size": 8,
                               "disc_num_layers": 2},
                },
            },
        },
        "data": {"params": {"batch_size": 2, "spec_dir_path": str(tmp_path),
                            "mel_num": 16, "spec_len": 32, "spec_crop_len": 32}},
    }
    cfg_path = tmp_path / "vae.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path), str(tmp_path)


def test_vae_train_cli_end_to_end(vae_train_setup, tmp_path):
    from audiolcm_tpu.cli.train import main

    cfg_path, root = vae_train_setup
    logroot = str(tmp_path / "logs")
    main(["-b", cfg_path, "-t", "--max_epochs", "1", "-l", logroot])

    # a run dir with metrics + checkpoints must exist
    runs = os.listdir(logroot)
    assert len(runs) == 1
    rundir = os.path.join(logroot, runs[0])
    lines = [json.loads(l) for l in open(os.path.join(rundir, "metrics.jsonl"))]
    assert any("epoch_time_s" in l for l in lines)
    val_lines = [l for l in lines if "val/nll_loss" in l]
    assert val_lines and np.isfinite(val_lines[-1]["val/nll_loss"])
    ckpts = os.listdir(os.path.join(rundir, "checkpoints"))
    assert ckpts  # at least the end-of-epoch save


def test_build_loader_multihost_sharding(vae_train_setup, monkeypatch):
    """Multi-host wiring: with N simulated processes, `_build_loader` gives
    each host a disjoint batch shard whose union covers every train sample
    exactly once (DDPIndexBatchSampler `batches[rank::world]` parity)."""
    import jax

    from audiolcm_tpu.cli.train import _build_loader

    cfg_path, _ = vae_train_setup
    cfg = yaml.safe_load(open(cfg_path))

    def names_of(loader):
        seen = []
        for batch in loader:
            seen.extend(batch["f_name"] if "f_name" in batch else batch["names"])
        return seen

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    shards = []
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        loader = _build_loader(cfg, batch_size=2, split="train")
        loader.set_epoch(0)
        shards.append(set(tuple(b) for b in loader._batches))

    assert shards[0].isdisjoint(shards[1])
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    full = _build_loader(cfg, batch_size=2, split="train")
    assert set().union(*shards) == set(tuple(b) for b in full._batches)
    # per-host batch counts are balanced to within one batch
    assert abs(len(shards[0]) - len(shards[1])) <= 1
