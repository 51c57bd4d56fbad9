"""Static duration-bucket lattice.

The reference pads each batch to its max length rounded to a multiple of 4,
clamped to [64, 1248] (`joinaudiodataset_anylen.py:210-267`). Arbitrary
per-batch shapes would force an XLA recompile per new length, so the TPU
build quantizes batch lengths to a FIXED lattice: each bucket compiles once
and is reused. Duration-sorted batching (ordered_indices parity) keeps
padding waste low; contents are padded with the same pad_value (-5, the
log-mel floor).
"""

from __future__ import annotations

from bisect import bisect_left
from typing import Sequence

# Multiples of 4 spanning the reference's [64, 1248] clamp range.
# 312/624 are the 5s/10s production lengths; 1248 = 20 s max. 640 exists
# because anylen 10 s clips produce 625 mel frames (62.5 fps cap,
# `mel_spec.py:194`) — without it they'd pad 20% up to 752 (measured on
# musiccap.tsv: 99.9% of rows land between 624 and 640). 640 rather than
# the tight 628: 256*628 = 2^10*157 leaves the fused vocoder stages only
# 512/1024-sample Pallas tiles (25-50% halo waste on 35% of device time),
# while 640 = 2^7*5 tiles at 4096/8192 for a 2.4% padding cost. Every
# lattice point keeps 256*B friendly to `_pick_stage_tile` (models/
# bigvgan.py) — checked by tests/test_buckets.py.
DEFAULT_MEL_BUCKETS: tuple = (64, 128, 192, 256, 312, 384, 448, 512, 624, 640, 752, 880, 1000, 1248)

PAD_VALUE = -5.0
MIN_LEN = 64
MAX_LEN = 1248
MIN_FACTOR = 4


def bucket_for_length(n: int, lattice: Sequence[int] = DEFAULT_MEL_BUCKETS) -> int:
    """Smallest bucket >= n (clamped to the largest bucket)."""
    n = max(MIN_LEN, min(n, lattice[-1]))
    i = bisect_left(lattice, n)
    return lattice[min(i, len(lattice) - 1)]


def reference_pad_length(lengths: Sequence[int]) -> int:
    """The reference's exact per-batch pad length (collate_2d semantics):
    max length clamped to [64, 1248], rounded UP to a multiple of 4."""
    size = max(lengths)
    size = min(size, MAX_LEN)
    size = max(size, MIN_LEN)
    if size % MIN_FACTOR:
        size += MIN_FACTOR - size % MIN_FACTOR
    return size
