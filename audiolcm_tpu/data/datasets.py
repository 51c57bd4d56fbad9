"""Datasets + duration-bucketed, host-sharded batch loader.

Behavior parity (`ldm/data/joinaudiodataset_anylen.py`,
`joinaudiodataset_struct_sample_anylen.py`, `joinaudiodataset_624.py`):
  * mel .npy loading with corrupt-file fallback to a pad-value mel
  * caption dropout with prob `drop`
  * duration-sorted fixed-size batches, sharded `batches[rank::world]`
    across hosts, reshuffled per epoch with seed+epoch
  * struct datasets: two-pool mixing (main + other) where the other pool
    synthesizes struct_caption = f'<{cap}& all>'
  * fixed-length variant tile-pads to 624 frames (VAE training)

TPU redesign: batches are padded to the static bucket lattice
(data/buckets.py) instead of arbitrary lengths, so each bucket shape
compiles once. The loader is plain numpy on host; device transfer +
sharding happens in the train loop via parallel.shard_batch.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from audiolcm_tpu.data import buckets as B
from audiolcm_tpu.data.manifest import load_manifests, ordered_indices, split_dataframe


@dataclasses.dataclass
class SpecSample:
    mel: np.ndarray  # (80, T) log-mel
    ori_caption: str
    struct_caption: str
    name: Optional[str] = None


class SpecDataset:
    """Row-indexed mel+caption dataset over TSV manifests."""

    def __init__(
        self,
        split: str,
        spec_dir_path: str,
        mel_num: int = 80,
        drop: float = 0.0,
        pad_value: float = B.PAD_VALUE,
        synthesize_struct: bool = False,
        seed: int = 0,
    ):
        self.df = split_dataframe(load_manifests(spec_dir_path), split)
        self.split = split
        self.mel_num = mel_num
        self.drop = drop
        self.pad_value = pad_value
        self.synthesize_struct = synthesize_struct
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.df)

    def ordered_indices(self) -> Sequence[int]:
        return ordered_indices(self.df)

    def __getitem__(self, idx: int) -> SpecSample:
        row = self.df.iloc[idx]
        try:
            mel = np.load(row["mel_path"]).astype(np.float32)
        except Exception:
            mel = np.full((self.mel_num, B.MIN_LEN), self.pad_value, dtype=np.float32)
        ori = row.get("ori_cap", row.get("caption", ""))
        if self.synthesize_struct or "caption" not in row or pd.isna(row.get("caption")):
            struct = f"<{ori}& all>"
        else:
            struct = row["caption"]
        if self.drop > 0 and self.rng.uniform() <= self.drop:
            ori, struct = "", ""
        name = row["name"] if "name" in row else None
        return SpecSample(mel=mel, ori_caption=str(ori), struct_caption=str(struct), name=name)


def collate_pad(
    samples: List[SpecSample],
    pad_value: float = B.PAD_VALUE,
    use_bucket_lattice: bool = True,
) -> dict:
    """Pad mels to a common length: the bucket lattice entry covering the
    batch max (TPU default), or the reference's exact multiple-of-4 length."""
    lengths = [s.mel.shape[1] for s in samples]
    if use_bucket_lattice:
        size = B.bucket_for_length(max(lengths))
    else:
        size = B.reference_pad_length(lengths)
    mel_num = samples[0].mel.shape[0]
    out = np.full((len(samples), mel_num, size), pad_value, dtype=np.float32)
    for i, s in enumerate(samples):
        t = min(s.mel.shape[1], size)
        out[i, :, :t] = s.mel[:, :t]
    return {
        "mel": out,
        "ori_caption": [s.ori_caption for s in samples],
        "struct_caption": [s.struct_caption for s in samples],
        "names": [s.name for s in samples],
    }


def collate_tile(samples: List[SpecSample], target_len: int = 624) -> dict:
    """Fixed-length tile-pad (VAE training, `joinaudiodataset_624.py:52-74`):
    mels shorter than target are tiled; longer ones are cropped."""
    mel_num = samples[0].mel.shape[0]
    out = np.empty((len(samples), mel_num, target_len), dtype=np.float32)
    for i, s in enumerate(samples):
        t = s.mel.shape[1]
        if t >= target_len:
            out[i] = s.mel[:, :target_len]
        else:
            reps = -(-target_len // t)
            out[i] = np.tile(s.mel, (1, reps))[:, :target_len]
    return {
        "mel": out,
        "ori_caption": [s.ori_caption for s in samples],
        "struct_caption": [s.struct_caption for s in samples],
        "names": [s.name for s in samples],
    }


class BucketedBatchLoader:
    """Duration-sorted fixed-size batches, host-sharded, epoch-reshuffled.

    DDPIndexBatchSampler parity (`joinaudiodataset_anylen.py:130-208`) with
    jax process sharding replacing torch.distributed rank/world."""

    def __init__(
        self,
        dataset: SpecDataset,
        batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        use_bucket_lattice: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.use_bucket_lattice = use_bucket_lattice
        self.epoch = 0

        indices = list(dataset.ordered_indices())
        batches = [
            indices[i : i + batch_size] for i in range(0, len(indices), batch_size)
        ]
        if drop_last and batches and len(batches[-1]) < batch_size:
            batches = batches[:-1]
        if len(batches) > num_replicas:
            batches = batches[rank::num_replicas]
        self._batches = batches

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self._batches)

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self._batches))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        for bi in order:
            samples = [self.dataset[i] for i in self._batches[bi]]
            yield collate_pad(
                samples,
                pad_value=self.dataset.pad_value,
                use_bucket_lattice=self.use_bucket_lattice,
            )


class TwoPoolBatchLoader:
    """Main + other pool mixing (`joinaudiodataset_struct_sample_anylen.py:
    151-222`): after each main-pool batch, one random other-pool batch."""

    def __init__(self, main: BucketedBatchLoader, other: BucketedBatchLoader):
        self.main = main
        self.other = other

    def set_epoch(self, epoch: int) -> None:
        self.main.set_epoch(epoch)
        self.other.set_epoch(epoch)

    def __len__(self) -> int:
        return 2 * len(self.main)

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.main.seed + self.main.epoch)
        n_other = len(self.other._batches)
        n_main = len(self.main)
        # distinct other-batch picks per epoch, matching the reference's
        # np.random.choice(..., replace=False); when the other pool is the
        # smaller one, chain full permutations so coverage stays maximal
        if n_other >= n_main:
            order = rng.choice(n_other, size=n_main, replace=False)
        else:
            reps = -(-n_main // n_other)
            order = np.concatenate(
                [rng.permutation(n_other) for _ in range(reps)]
            )[:n_main]
        for batch, oi in zip(self.main, order):
            yield batch
            samples = [self.other.dataset[i] for i in self.other._batches[int(oi)]]
            yield collate_pad(samples, pad_value=self.other.dataset.pad_value)
