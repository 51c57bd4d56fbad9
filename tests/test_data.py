"""Data pipeline tests: buckets, manifests, loaders, mel prep."""

import os

import numpy as np
import pandas as pd
import pytest

from audiolcm_tpu.data import buckets as B
from audiolcm_tpu.data.datasets import (
    BucketedBatchLoader,
    SpecDataset,
    TwoPoolBatchLoader,
    collate_pad,
    collate_tile,
    SpecSample,
)
from audiolcm_tpu.data.manifest import add_name_num, split_dataframe
from audiolcm_tpu.data.melprep import load_wav_mono_16k, process_tsv


def test_bucket_lattice():
    assert B.bucket_for_length(1) == 64
    assert B.bucket_for_length(64) == 64
    assert B.bucket_for_length(65) == 128
    assert B.bucket_for_length(624) == 624
    assert B.bucket_for_length(5000) == 1248
    for b in B.DEFAULT_MEL_BUCKETS:
        assert b % B.MIN_FACTOR == 0


def test_reference_pad_length():
    # collate_2d semantics: clamp [64,1248], round up to multiple of 4
    assert B.reference_pad_length([10]) == 64
    assert B.reference_pad_length([65]) == 68
    assert B.reference_pad_length([623, 100]) == 624
    assert B.reference_pad_length([2000]) == 1248


def test_split_semantics():
    df = pd.DataFrame({
        "name": [f"a{i}" for i in range(150)],
        "duration": np.arange(150.0),
    })
    assert len(split_dataframe(df, "val")) == 100
    assert len(split_dataframe(df, "train")) == 50
    dup = pd.DataFrame({"name": ["x", "x", "y"], "duration": [1.0, 2.0, 3.0]})
    out = add_name_num(dup)
    assert list(out["name"]) == ["x_0", "x_1", "y_0"]


def test_collate_pad_and_tile():
    mk = lambda t: SpecSample(np.zeros((4, t), np.float32), "c", "<c& all>")
    batch = collate_pad([mk(100), mk(150)])
    assert batch["mel"].shape == (2, 4, 192)  # bucket covering 150
    assert batch["mel"][0, 0, 100] == B.PAD_VALUE

    batch = collate_pad([mk(100), mk(150)], use_bucket_lattice=False)
    assert batch["mel"].shape == (2, 4, 152)  # reference exact pad

    tiled = collate_tile([mk(100)], target_len=250)
    assert tiled["mel"].shape == (1, 4, 250)


@pytest.fixture
def manifest_dir(tmp_path):
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    for i in range(12):
        t = 70 + 10 * i
        mel = rng.standard_normal((8, t)).astype(np.float32)
        path = mel_dir / f"m{i}.npy"
        np.save(path, mel)
        rows.append({
            "name": f"clip{i}", "dataset": "test", "ori_cap": f"caption {i}",
            "caption": f"<caption {i}& all>", "mel_path": str(path),
            "audio_path": f"/none/{i}.wav", "duration": t / 62.5,
        })
    df = pd.DataFrame(rows)
    df.to_csv(tmp_path / "data.tsv", sep="\t", index=False)
    return str(tmp_path)


def test_bucketed_loader_sharding(manifest_dir):
    ds = SpecDataset("test", manifest_dir, mel_num=8)
    loaders = [
        BucketedBatchLoader(ds, batch_size=2, num_replicas=2, rank=r, shuffle=False)
        for r in range(2)
    ]
    n0, n1 = len(loaders[0]), len(loaders[1])
    assert n0 + n1 == 6  # 12 rows / bs 2
    seen = set()
    for loader in loaders:
        for batch in loader:
            assert batch["mel"].shape[0] == 2
            assert batch["mel"].shape[2] in B.DEFAULT_MEL_BUCKETS
            seen.update(batch["names"])
    assert len(seen) == 12  # disjoint shard coverage


def test_loader_epoch_reshuffle(manifest_dir):
    ds = SpecDataset("test", manifest_dir, mel_num=8)
    loader = BucketedBatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    first = [b["names"] for b in loader]
    loader.set_epoch(1)
    second = [b["names"] for b in loader]
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert first != second  # different order across epochs


def test_two_pool_loader(manifest_dir):
    ds = SpecDataset("test", manifest_dir, mel_num=8)
    main = BucketedBatchLoader(ds, batch_size=2, shuffle=False)
    other = BucketedBatchLoader(ds, batch_size=2, shuffle=False)
    batches = list(TwoPoolBatchLoader(main, other))
    assert len(batches) == 2 * len(main)


def test_two_pool_other_batches_distinct_per_epoch(manifest_dir):
    """Other-pool picks are without replacement within an epoch (reference
    DDPIndexBatchSampler uses np.random.choice(..., replace=False)): with
    equal pool sizes every other-pool batch appears exactly once."""
    ds = SpecDataset("test", manifest_dir, mel_num=8)
    main = BucketedBatchLoader(ds, batch_size=2, shuffle=False)
    other = BucketedBatchLoader(ds, batch_size=2, shuffle=False)
    loader = TwoPoolBatchLoader(main, other)
    for epoch in range(3):
        loader.set_epoch(epoch)
        batches = list(loader)
        other_names = [tuple(b["names"]) for b in batches[1::2]]
        assert len(set(other_names)) == len(other._batches)


def test_melprep_roundtrip(tmp_path):
    from scipy.io import wavfile

    sr = 16000
    wav = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.5).astype(np.float32)
    wav_path = tmp_path / "tone.wav"
    wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))
    df = pd.DataFrame({
        "name": ["tone"], "dataset": ["t"], "ori_cap": ["a tone"],
        "audio_path": [str(wav_path)],
    })
    tsv = tmp_path / "in.tsv"
    df.to_csv(tsv, sep="\t", index=False)

    out = process_tsv(str(tsv), mel_dir=str(tmp_path / "mels"))
    assert len(out) == 1
    mel = np.load(out.iloc[0]["mel_path"])
    assert mel.shape[0] == 80
    assert abs(mel.shape[1] - 62.5) <= 1  # ~62.5 frames for 1 s
    assert abs(out.iloc[0]["duration"] - 1.0) < 0.01

    # 44.1k stereo resample path
    wav2 = np.stack([wav, wav], axis=1)
    wav_path2 = tmp_path / "stereo.wav"
    wavfile.write(wav_path2, 44100, (wav2 * 32767).astype(np.int16))
    loaded = load_wav_mono_16k(str(wav_path2))
    assert loaded.ndim == 1
    assert abs(len(loaded) - 16000 / 44100 * len(wav)) < 10


def _tone_tsv(tmp_path, n=6, broken_row=True):
    from scipy.io import wavfile

    sr = 16000
    rows = []
    for i in range(n):
        freq = 200 + 60 * i
        wav = (np.sin(2 * np.pi * freq * np.arange(sr // 2) / sr) * 0.4)
        path = tmp_path / f"tone{i}.wav"
        wavfile.write(path, sr, (wav * 32767).astype(np.int16))
        rows.append({"name": f"tone{i}", "dataset": "t",
                     "ori_cap": f"tone {i}", "audio_path": str(path)})
    if broken_row:
        rows.insert(2, {"name": "broken", "dataset": "t", "ori_cap": "x",
                        "audio_path": str(tmp_path / "missing.wav")})
    tsv = tmp_path / "in.tsv"
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)
    return str(tsv)


def test_melprep_workers_match_single_process(tmp_path):
    """mel_spec.py:66-75 worker sharding: an N-worker run produces the
    identical npy set and output TSV as the single-process run (broken rows
    dropped either way)."""
    tsv = _tone_tsv(tmp_path)
    single_dir, multi_dir = tmp_path / "m1", tmp_path / "m2"
    df1 = process_tsv(tsv, out_tsv=str(tmp_path / "o1.tsv"),
                      mel_dir=str(single_dir))
    df2 = process_tsv(tsv, out_tsv=str(tmp_path / "o2.tsv"),
                      mel_dir=str(multi_dir), num_workers=2)

    assert sorted(os.path.basename(p) for p in os.listdir(single_dir)) == \
           sorted(os.path.basename(p) for p in os.listdir(multi_dir))
    assert list(df1["name"]) == list(df2["name"])  # same rows, same order
    np.testing.assert_allclose(df1["duration"], df2["duration"])
    for p1, p2 in zip(df1["mel_path"], df2["mel_path"]):
        np.testing.assert_allclose(np.load(p1), np.load(p2), atol=1e-6)


def test_melprep_skip_existing_resumes(tmp_path):
    tsv = _tone_tsv(tmp_path, n=3, broken_row=False)
    mel_dir = tmp_path / "mels"
    df1 = process_tsv(tsv, out_tsv=str(tmp_path / "o.tsv"), mel_dir=str(mel_dir))
    mtimes = {p: os.path.getmtime(p) for p in df1["mel_path"]}
    df2 = process_tsv(tsv, out_tsv=str(tmp_path / "o.tsv"),
                      mel_dir=str(mel_dir), skip_existing=True)
    assert {p: os.path.getmtime(p) for p in df2["mel_path"]} == mtimes
    np.testing.assert_allclose(df1["duration"], df2["duration"], atol=0.02)


def test_build_loader_two_pool_schema(manifest_dir, tmp_path):
    """CLI loader factory honors teacher.yaml's two-pool schema
    (main_spec_dir_path + other_spec_dir_path): train AND validation
    interleave an other-pool batch after each main batch with synthesized
    struct captions — the reference's `_val_dataloader` builds the same
    two-pool DDPIndexBatchSampler over (main val carve-out, full other
    pool) as training (`main.py:248-265`)."""
    from audiolcm_tpu.cli.train import _build_loader

    rng = np.random.default_rng(1)

    def make_pool(root, prefix, with_caption):
        mel_dir = root / "mels"
        mel_dir.mkdir(parents=True)
        rows = []
        for i in range(104):  # first 100 rows are val; 4 train rows
            t = 70 + (i % 4) * 10
            path = mel_dir / f"{prefix}{i}.npy"
            np.save(path, rng.standard_normal((8, t)).astype(np.float32))
            row = {"name": f"{prefix}{i}", "dataset": "d",
                   "ori_cap": f"{prefix} cap {i}", "mel_path": str(path),
                   "audio_path": "/none", "duration": t / 62.5}
            if with_caption:
                row["caption"] = f"<{prefix} cap {i}& struct>"
            rows.append(row)
        pd.DataFrame(rows).to_csv(root / "data.tsv", sep="\t", index=False)

    main_dir, other_dir = tmp_path / "main", tmp_path / "other"
    make_pool(main_dir, "main", with_caption=True)
    make_pool(other_dir, "other", with_caption=False)  # struct synthesized

    cfg = {"data": {"params": {"main_spec_dir_path": str(main_dir),
                               "other_spec_dir_path": str(other_dir),
                               "mel_num": 8}}}
    train = _build_loader(cfg, batch_size=2, split="train")
    assert isinstance(train, TwoPoolBatchLoader)
    # the other pool has NO 100-row val carve-out (reference splits only the
    # main pool, joinaudiodataset_struct_sample_anylen.py:41-46)
    assert len(train.other.dataset) == 104
    assert len(train.main.dataset) == 4
    # interleave: even positions main, odd positions other
    batches = list(train)
    assert len(batches) == 2 * len(train.main)
    assert all(n.startswith("main") for n in batches[0]["names"])
    assert all(n.startswith("other") for n in batches[1]["names"])
    assert batches[0]["struct_caption"][0].endswith("& struct>")
    assert batches[1]["struct_caption"][0].startswith("<other cap")
    assert batches[1]["struct_caption"][0].endswith("& all>")

    # validation interleaves too: main batches come from the 100-row val
    # carve-out, other batches from the FULL other pool
    val = _build_loader(cfg, batch_size=2, split="valid")
    assert isinstance(val, TwoPoolBatchLoader)
    assert len(val.main.dataset) == 100
    assert len(val.other.dataset) == 104
    val_batches = list(val)
    assert all(n.startswith("main") for n in val_batches[0]["names"])
    assert all(n.startswith("other") for n in val_batches[1]["names"])

    # single-pool schema still works
    single = _build_loader(
        {"data": {"params": {"spec_dir_path": str(main_dir), "mel_num": 8}}},
        batch_size=2, split="valid",
    )
    assert isinstance(single, BucketedBatchLoader)
