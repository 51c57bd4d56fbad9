"""TSV manifest loading and split semantics.

Behavior parity: `ldm/data/joinaudiodataset_anylen.py:18-66` — glob *.tsv
over comma-separated directories, concat; val = first 100 rows, train = the
rest; test adds a `_{n}` suffix to duplicate names (`add_name_num`);
`ordered_indices` sorts by the duration column.
"""

from __future__ import annotations

import glob
from typing import List, Sequence

import pandas as pd


def load_manifests(spec_dir_path: str) -> pd.DataFrame:
    files: List[str] = []
    for dir_path in spec_dir_path.split(","):
        files += glob.glob(f"{dir_path}/*.tsv")
    if not files:
        raise FileNotFoundError(f"no .tsv manifests under {spec_dir_path!r}")
    return pd.concat([pd.read_csv(f, sep="\t") for f in files], ignore_index=True)


def add_name_num(df: pd.DataFrame) -> pd.DataFrame:
    """Disambiguate repeated audio names across captions (test split)."""
    df = df.copy()
    counts: dict = {}
    new_names = []
    for name in df["name"]:
        n = counts.get(name, -1) + 1
        counts[name] = n
        new_names.append(f"{name}_{n}")
    df["name"] = new_names
    return df


def split_dataframe(df: pd.DataFrame, split: str) -> pd.DataFrame:
    if split == "train":
        out = df.iloc[100:]
    elif split in ("valid", "val"):
        out = df.iloc[:100]
    elif split == "test":
        out = add_name_num(df)
    elif split == "all":
        # no validation carve-out: the struct other-pool trains on the full
        # manifest (joinaudiodataset_struct_sample_anylen.py:41-46 splits only
        # the main pool)
        out = df
    else:
        raise ValueError(f"Unknown split {split!r}")
    return out.reset_index(drop=True)


def ordered_indices(df: pd.DataFrame) -> Sequence[int]:
    """Duration-sorted row order (keeps pad waste low per batch)."""
    return list(df[["duration"]].sort_values(by="duration").index)
