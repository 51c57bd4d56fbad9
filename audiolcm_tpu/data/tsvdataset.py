"""Test-set TSV dataset (AudioCaps / MusicCaps eval input).

Behavior parity: `ldm/data/tsvdataset.py`: rows with
(name, dataset, ori_cap, mel_path, caption, audio_path); duplicate names
get `_{n}` suffixes; mels zero-padded/cropped to spec_crop_len (624);
TSVDatasetStruct yields {'image', 'caption': {ori, struct}, 'f_name'}.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from audiolcm_tpu.data.manifest import add_name_num


class TSVDatasetStruct:
    def __init__(self, tsv_path: str, spec_crop_len: int = 624, load_mels: bool = False):
        self.df = add_name_num(pd.read_csv(tsv_path, sep="\t"))
        self.spec_crop_len = spec_crop_len
        self.load_mels = load_mels

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> dict:
        row = self.df.iloc[idx]
        item = {
            "caption": {
                "ori_caption": str(row["ori_cap"]),
                "struct_caption": str(row["caption"]),
            },
            "f_name": row["name"],
        }
        if self.load_mels and "mel_path" in row and isinstance(row["mel_path"], str):
            spec = np.load(row["mel_path"]).astype(np.float32)
            if spec.shape[1] <= self.spec_crop_len:
                spec = np.pad(spec, ((0, 0), (0, self.spec_crop_len - spec.shape[1])))
            item["image"] = spec[:, : self.spec_crop_len]
        return item
