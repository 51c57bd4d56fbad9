"""End-to-end acceptance-loop rehearsal (cli/eval_acceptance.py).

Runs the single command that real checkpoints will drop into: build the
pipeline from a reference-format synthetic checkpoint, generate over a test
TSV, and emit the CLAP+FAD JSON (CLAP null without weights; FAD via the
checkpoint-free log-mel-stats embedder against the TSV's GT wavs)."""

import json
import os

import numpy as np
import pytest

from tests.test_api import StubTokenizers, synthetic_ckpt  # noqa: F401


def _write_gt_wavs_and_tsv(tmp_path, n=3):
    from scipy.io import wavfile

    rng = np.random.default_rng(7)
    rows = []
    names = [f"clip{i}" for i in range(n)]
    for i, name in enumerate(names):
        wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)
        path = tmp_path / f"gt_{name}.wav"
        wavfile.write(path, 16000, (wav * 32767).astype(np.int16))
        cap = f"sound number {i}"
        rows.append(f"{name}\taudiocaps\t{cap}\t\t<{cap}& all>\t{path}")
    tsv = tmp_path / "test.tsv"
    tsv.write_text(
        "name\tdataset\tori_cap\tmel_path\tcaption\taudio_path\n"
        + "\n".join(rows) + "\n"
    )
    return str(tsv)


def test_acceptance_loop_end_to_end(synthetic_ckpt, tmp_path, monkeypatch, capsys):
    import audiolcm_tpu.api as api

    monkeypatch.setattr(api, "Tokenizers", lambda *a, **k: StubTokenizers())
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    tsv = _write_gt_wavs_and_tsv(tmp_path)
    outdir = tmp_path / "acc"

    from audiolcm_tpu.cli.eval_acceptance import main

    out = main([
        "-b", cfg_path, "--ckpt", ckpt_path, "--vocoder-ckpt", voc_dir,
        "--tsv", tsv, "--outdir", str(outdir),
        "--W", "8", "--batch_size", "2", "--limit", "2",
    ])
    assert out["n_clips"] == 2
    assert out["clap_score"] is None  # no CLAP weights passed
    assert out["clap_gt_anchor"] == pytest.approx(0.479077)
    assert out["fad_embedder"] == "logmel_stats"
    assert np.isfinite(out["fad"]) and out["fad"] >= 0.0

    # artifacts: result.csv + wavs + acceptance.json, and ONE parseable JSON
    # line on stdout (driver/scripting contract)
    assert os.path.exists(outdir / "result.csv")
    with open(outdir / "acceptance.json") as f:
        assert json.load(f) == out
    printed = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert json.loads(printed[-1]) == out

    # --skip_generate recomputes scores from the existing outdir
    out2 = main([
        "-b", cfg_path, "--ckpt", ckpt_path, "--vocoder-ckpt", voc_dir,
        "--tsv", tsv, "--outdir", str(outdir), "--limit", "2",
        "--skip_generate",
    ])
    assert out2["fad"] == pytest.approx(out["fad"])


def test_acceptance_loop_on_shipped_audiocaps_tsv(synthetic_ckpt, tmp_path,
                                                  monkeypatch):
    """VERDICT r4 #5: the acceptance loop runs the REAL shipped caption set
    (audiocaps_test_16000_struct.tsv, in-repo) end-to-end on synthetic
    weights — the command real checkpoints drop into, with the actual TSV.
    GT wavs aren't shipped (audio is external), so FAD degrades to the
    documented no-GT note while generation + CLAP plumbing run for real."""
    import audiolcm_tpu.api as api

    monkeypatch.setattr(api, "Tokenizers", lambda *a, **k: StubTokenizers())
    cfg_path, ckpt_path, voc_dir = synthetic_ckpt
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tsv = os.path.join(repo, "audiocaps_test_16000_struct.tsv")
    outdir = tmp_path / "acc_real"

    from audiolcm_tpu.cli.eval_acceptance import main

    out = main([
        "-b", cfg_path, "--ckpt", ckpt_path, "--vocoder-ckpt", voc_dir,
        "--tsv", tsv, "--outdir", str(outdir),
        "--W", "8", "--batch_size", "2", "--limit", "2",
    ])
    assert out["n_clips"] == 2
    assert out["fad"] is None and "no ground-truth wavs" in out["fad_note"]
    # result.csv carries the real first captions of the shipped TSV
    import pandas as pd

    res = pd.read_csv(outdir / "result.csv", sep="\t")
    src = pd.read_csv(tsv, sep="\t")
    assert len(res) == 2
    assert res["caption"].tolist() == src["ori_cap"].tolist()[:2]
