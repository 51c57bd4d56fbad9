"""Device mesh + sharding utilities.

The reference's only distribution strategy is NCCL DDP (SURVEY.md §2.12:
`main.py:613`, rank-strided batch sharding in `DDPIndexBatchSampler`). The
TPU-native equivalent is a single-controller jax mesh with a data axis:
params are replicated, batches are sharded along `data`, and XLA inserts the
gradient psum over ICI automatically when the jitted loss averages over the
global batch. A `model` axis is reserved for optional tensor sharding of the
distillation's three param trees (SURVEY.md §2.12 ZeRO note) even though the
~150M-param nets don't need TP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1D data mesh by default; pass axis_names=('data','model') for 2D."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devs = np.asarray(devices)
    if len(axis_names) == 1:
        mesh_devs = devs
    else:
        # all devices on data axis, model axis of size 1 unless reshaped by caller
        mesh_devs = devs.reshape((len(devs),) + (1,) * (len(axis_names) - 1))
    return Mesh(mesh_devs, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for array batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def form_global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Per-process local batch shards -> one globally-sharded array pytree.

    Multi-host DDP semantics (`joinaudiodataset_anylen.py:130-168` rank
    sharding): each process's loader yields only its slice of the global
    batch; jax.make_array_from_process_local_data stitches the slices into a
    single jax.Array sharded over the mesh, so the jitted step sees the
    global batch and XLA inserts the cross-host collectives. Single-process
    falls back to plain device_put sharding."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def fsdp_shardings(params, mesh: Mesh, axis: str = "data", min_size: int = 2**15):
    """ZeRO/FSDP-style parameter sharding specs (SURVEY.md §2.12, §7: the
    3-param-tree LCM distillation is the memory pressure point on small
    chips). Each leaf above `min_size` elements is sharded along its
    largest dimension divisible by the mesh axis size; XLA inserts the
    all-gathers/reduce-scatters during the jitted step. Returns a pytree of
    NamedSharding matching `params` for use as in_shardings/device_put."""
    n = mesh.shape[axis]

    def spec_for(x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                pspec = [None] * x.ndim
                pspec[d] = axis
                return NamedSharding(mesh, P(*pspec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "data", min_size: int = 2**15):
    """Device-put params with fsdp_shardings."""
    shardings = fsdp_shardings(params, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
