"""Fresh-clone usability of the SHIPPED configs (VERDICT r4 'Next round' #5).

The reference treats configs/{audiolcm,teacher,autoencoder1d}.yaml as the
public API of the training system (SURVEY §1: "the YAMLs are the de-facto
public API"). These tests prove the repo-native copies work from a clean
clone with no reference-tree access:

  1. every shipped YAML parses and builds its full-size model graph through
     the explicit registry,
  2. `cli/train.py -b configs/autoencoder1d.yaml -t` reaches train steps on
     the CPU mesh with ONLY data-path/shape dotlist overrides (the model is
     the shipped full-size VAE),
  3. the diffusion configs reach their first train step through the same
     file + dotlist mechanism (towers shrunk via the documented
     bert_config/t5_config/unet-param extensions so the CPU step stays
     test-sized), exercising the fresh-init fallback for the checkpoint
     files a clean clone does not have,
  4. the shipped eval manifests (audiocaps_test_16000_struct.tsv,
     musiccap.tsv — reference §2.7 "ship as-is for eval") load through
     TSVDatasetStruct with the real caption set.
"""

import json
import os

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "configs")


def test_shipped_yamls_parse_and_build():
    from audiolcm_tpu import config as cfg_mod

    for name in ("audiolcm.yaml", "teacher.yaml"):
        cfg = cfg_mod.load_yaml(os.path.join(CONFIGS, name))
        sys_cfg = cfg_mod.parse_diffusion_config(cfg)
        assert sys_cfg.unet.hidden_size == 576
        assert sys_cfg.unet.depth == 4
        assert sys_cfg.vae.config.ch == 384
        assert sys_cfg.mel_dim == 20 and sys_cfg.mel_length == 312
        assert {"clap_text", "t5"} <= set(sys_cfg.cond)
    # audiolcm is the LCM config, teacher is not
    lcm = cfg_mod.load_yaml(os.path.join(CONFIGS, "audiolcm.yaml"))
    assert lcm["model"]["params"]["use_lcm"] is True
    assert lcm["model"]["params"]["num_ddim_timesteps"] == 50
    assert lcm["model"]["params"]["w_min"] == 4
    assert lcm["model"]["params"]["w_max"] == 12

    vae_cfg = cfg_mod.load_yaml(os.path.join(CONFIGS, "autoencoder1d.yaml"))
    vae = cfg_mod.build_from_target(vae_cfg["model"])
    assert vae.config.ch == 384 and vae.config.z_channels == 20
    loss_p = vae_cfg["model"]["params"]["lossconfig"]["params"]
    assert loss_p["disc_start"] == 80001 and loss_p["r1_reg_weight"] == 3


def _write_mels(tmp_path, n_rows, mel_num, t):
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_rows):
        mel = (rng.standard_normal((mel_num, t)) * 0.5).astype(np.float32)
        path = mel_dir / f"m{i}.npy"
        np.save(path, mel)
        rows.append({"name": f"c{i}", "dataset": "syn", "ori_cap": f"cap {i}",
                     "caption": f"<cap {i}& all>", "mel_path": str(path),
                     "audio_path": "/none", "duration": t / 62.5})
    import pandas as pd

    pd.DataFrame(rows).to_csv(tmp_path / "data.tsv", sep="\t", index=False)
    return str(tmp_path)


def _assert_trained(logroot):
    runs = os.listdir(logroot)
    assert len(runs) == 1
    rundir = os.path.join(logroot, runs[0])
    lines = [json.loads(l) for l in open(os.path.join(rundir, "metrics.jsonl"))]
    epoch_lines = [l for l in lines if "epoch_time_s" in l]
    assert epoch_lines, "no epoch summary — training never stepped"
    return epoch_lines


def test_vae_train_from_shipped_config(tmp_path):
    """Full-size shipped VAE (ch 384) reaches real train steps; only data
    paths/shapes are overridden."""
    from audiolcm_tpu.cli.train import main

    data_root = _write_mels(tmp_path, 108, mel_num=80, t=64)
    logroot = str(tmp_path / "logs")
    main(["-b", os.path.join(CONFIGS, "autoencoder1d.yaml"), "-t",
          "--max_epochs", "1", "-l", logroot,
          "--data.params.spec_dir_path", data_root,
          "--data.params.batch_size", "2",
          "--data.params.spec_len", "64",
          "--data.params.spec_crop_len", "64"])
    _assert_trained(logroot)
    runs = os.listdir(logroot)
    lines = [json.loads(l) for l in
             open(os.path.join(logroot, runs[0], "metrics.jsonl"))]
    val_lines = [l for l in lines if "val/nll_loss" in l]
    assert val_lines and np.isfinite(val_lines[-1]["val/nll_loss"])


@pytest.mark.parametrize("name,val_key", [
    ("audiolcm.yaml", "val/loss"),
    ("teacher.yaml", "val/loss_simple"),
])
def test_diffusion_train_from_shipped_config(tmp_path, monkeypatch, name,
                                             val_key):
    """Shipped audiolcm/teacher YAML reaches its first train step on the CPU
    mesh from a clean clone: no checkpoint files exist, so every sub-model
    fresh-initializes (the documented fallback); towers/DiT are shrunk via
    the same dotlist mechanism `main.py:606-608` provides."""
    import audiolcm_tpu.api as api
    from tests.test_api import StubTokenizers

    monkeypatch.setattr(api, "Tokenizers", lambda *a, **k: StubTokenizers())
    from audiolcm_tpu.cli.train import main

    data_root = _write_mels(tmp_path, 104, mel_num=16, t=32)
    logroot = str(tmp_path / "logs")
    main(["-b", os.path.join(CONFIGS, name), "-t",
          "--max_epochs", "1", "-l", logroot,
          "--data.params.spec_dir_path", data_root,
          "--data.params.main_spec_dir_path", data_root,
          "--data.params.other_spec_dir_path", "null",
          "--data.params.batch_size", "2",
          "--data.params.mel_num", "16",
          # documented schema extensions: scaled-down towers for tests
          "--model.params.unet_config.params.in_channels", "4",
          "--model.params.unet_config.params.context_dim", "24",
          "--model.params.unet_config.params.hidden_size", "32",
          "--model.params.unet_config.params.num_heads", "2",
          "--model.params.unet_config.params.depth", "1",
          "--model.params.first_stage_config.params.embed_dim", "4",
          "--model.params.first_stage_config.params.ddconfig.in_channels", "16",
          "--model.params.first_stage_config.params.ddconfig.out_ch", "16",
          "--model.params.first_stage_config.params.ddconfig.z_channels", "4",
          "--model.params.first_stage_config.params.ddconfig.ch", "32",
          "--model.params.first_stage_config.params.ddconfig.ch_mult", "[1, 2]",
          "--model.params.first_stage_config.params.ddconfig.num_res_blocks", "1",
          "--model.params.first_stage_config.params.ddconfig.attn_layers", "[]",
          "--model.params.cond_stage_config.params.d_proj", "24",
          "--model.params.cond_stage_config.params.bert_config",
          "{vocab_size: 64, hidden_size: 16, num_layers: 1, num_heads: 2, "
          "intermediate_size: 32}",
          "--model.params.cond_stage_config.params.t5_config",
          "{vocab_size: 64, d_model: 24, d_kv: 8, d_ff: 32, num_layers: 1, "
          "num_heads: 2}"])
    epoch_lines = _assert_trained(logroot)
    assert np.isfinite(epoch_lines[-1][val_key])


def test_shipped_eval_manifests_load():
    """audiocaps_test_16000_struct.tsv (4,500 rows) and musiccap.tsv (5,405
    rows) ship in-repo; TSVDatasetStruct parses the real caption sets
    (`tsvdataset.py:47-58` semantics, incl. add_name_num dedup)."""
    from audiolcm_tpu.data.tsvdataset import TSVDatasetStruct

    for fname, n_min in (("audiocaps_test_16000_struct.tsv", 4000),
                         ("musiccap.tsv", 5000)):
        path = os.path.join(REPO, fname)
        assert os.path.exists(path), f"{fname} must ship in-repo"
        ds = TSVDatasetStruct(path, spec_crop_len=624)
        assert len(ds) >= n_min
        item = ds[0]
        cap = item["caption"]
        assert cap["ori_caption"] and cap["struct_caption"]
        assert "&" in cap["struct_caption"]  # struct syntax
        assert item["f_name"]
