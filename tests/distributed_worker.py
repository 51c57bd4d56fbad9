"""Worker for the real two-process distributed test (not a pytest module).

Usage: python tests/distributed_worker.py <rank> <port> <workdir>

Initializes jax.distributed with 2 CPU processes, then:
  1. builds the rank-sharded loader over the synthetic manifest in <workdir>
     (DDP sampler parity, `joinaudiodataset_anylen.py:130-168`) and records
     which sample names this process saw;
  2. runs ONE global LCM-distillation step: each process contributes its
     local half of a deterministic global batch via
     parallel.form_global_batch, the jitted step runs over the 2-device
     global mesh (1 CPU device per process), and the loss is recorded.
Writes proc<rank>.json with {"names", "loss"} for the parent to assert
disjoint shard coverage and cross-process/single-process loss parity.
"""

import json
import os
import sys


def main():
    rank, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 1

    # ---- 1. rank-sharded loader --------------------------------------------
    from audiolcm_tpu.data.datasets import BucketedBatchLoader, SpecDataset

    ds = SpecDataset("test", workdir, mel_num=8)
    loader = BucketedBatchLoader(
        ds, batch_size=2, num_replicas=jax.process_count(),
        rank=jax.process_index(), shuffle=False,
    )
    names = [n for batch in loader for n in batch["names"]]

    # ---- 2. one global distillation step -----------------------------------
    import jax.numpy as jnp

    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.models.dit import ConcatDiT2MLP
    from audiolcm_tpu.nn.embeddings import guidance_scale_embedding
    from audiolcm_tpu.parallel import form_global_batch, make_mesh
    from audiolcm_tpu.train.lcm_distill import (
        Batch,
        LCMDistillConfig,
        init_train_state,
        make_lcm_distill_step,
    )

    mesh = make_mesh()  # all 2 global devices
    model = ConcatDiT2MLP(in_channels=4, context_dim=16, hidden_size=32,
                          depth=2, num_heads=4, max_len=64)
    rng = jax.random.PRNGKey(0)
    global_batch, latent_len, ctx_len = 4, 16, 6
    x0 = jnp.zeros((1, latent_len, 4))
    teacher = model.init(
        rng, x0, jnp.zeros((1,), jnp.int32), jnp.zeros((1, ctx_len, 16)),
        guidance_scale_embedding(jnp.zeros((1,)), 256),
    )["params"]
    cfg = LCMDistillConfig()
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    step = make_lcm_distill_step(
        lambda p, x, t, c, w: model.apply({"params": p}, x, t, c, w),
        NoiseSchedule.linear(), cfg,
    )

    # deterministic GLOBAL batch; this process contributes its local half
    z_g = jax.random.normal(jax.random.PRNGKey(1), (global_batch, latent_len, 4))
    c_g = jax.random.normal(jax.random.PRNGKey(2), (global_batch, ctx_len, 16))
    lo, hi = rank * 2, (rank + 1) * 2
    import numpy as np

    batch = form_global_batch(
        Batch(z=np.asarray(z_g)[lo:hi], context=np.asarray(c_g)[lo:hi]), mesh
    )
    uncond = jax.device_put(
        jnp.zeros((1, ctx_len, 16)),
        jax.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    with mesh:
        _, metrics = jax.jit(step)(state, teacher, batch, uncond, rng)
    loss = float(metrics["train/loss"])

    with open(os.path.join(workdir, f"proc{rank}.json"), "w") as f:
        json.dump({"names": names, "loss": loss}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
