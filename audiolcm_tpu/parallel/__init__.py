from audiolcm_tpu.parallel.mesh import (
    batch_sharding,
    form_global_batch,
    fsdp_shardings,
    make_mesh,
    replicated,
    shard_batch,
    shard_params_fsdp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "form_global_batch",
    "replicated",
    "shard_batch",
    "fsdp_shardings",
    "shard_params_fsdp",
]
