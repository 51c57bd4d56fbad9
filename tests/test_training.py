"""Training-step tests: LCM distillation, teacher, VAE-GAN — all on the
8-device virtual CPU mesh where relevant."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.models.discriminators import NLayerDiscriminator2D
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian, VAEConfig
from audiolcm_tpu.nn.embeddings import guidance_scale_embedding
from audiolcm_tpu.parallel import make_mesh
from audiolcm_tpu.train.lcm_distill import (
    Batch,
    LCMDistillConfig,
    init_train_state,
    make_lcm_distill_step,
)
from audiolcm_tpu.train.teacher import TeacherConfig, init_teacher_state, make_teacher_step
from audiolcm_tpu.train.vae_gan import VAEGANConfig, init_vae_gan_state, make_vae_gan_steps


def _tiny_dit():
    model = ConcatDiT2MLP(
        in_channels=4, context_dim=8, hidden_size=32, depth=1, num_heads=4, max_len=64
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, 8)), guidance_scale_embedding(jnp.zeros((1,)), 256),
    )["params"]

    def apply_fn(p, x, t, ctx, w):
        return model.apply({"params": p}, x, t, ctx, w)

    return apply_fn, params


def test_lcm_distill_step_decreases_nothing_weird():
    apply_fn, teacher = _tiny_dit()
    cfg = LCMDistillConfig(learning_rate=1e-3)
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    schedule = NoiseSchedule.linear()
    step = jax.jit(make_lcm_distill_step(apply_fn, schedule, cfg))
    batch = Batch(
        z=jax.random.normal(jax.random.PRNGKey(1), (4, 8, 4)),
        context=jax.random.normal(jax.random.PRNGKey(2), (4, 4, 8)),
    )
    uncond = jnp.zeros((1, 4, 8))
    losses = []
    for i in range(3):
        state, metrics = step(state, teacher, batch, uncond, jax.random.PRNGKey(i))
        losses.append(float(metrics["train/loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # student must have moved; target EMA must differ from student
    s0 = jax.tree.leaves(teacher)[0]
    s1 = jax.tree.leaves(state.student)[0]
    assert np.abs(np.asarray(s1 - s0)).max() > 0


def test_lcm_distill_ema_rate():
    apply_fn, teacher = _tiny_dit()
    cfg = LCMDistillConfig(learning_rate=0.0)  # no student movement
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    # perturb target away from student, one step, check 0.95 blend
    target = jax.tree.map(lambda x: x + 1.0, state.target)
    state = state._replace(target=target)
    schedule = NoiseSchedule.linear()
    step = jax.jit(make_lcm_distill_step(apply_fn, schedule, cfg))
    batch = Batch(z=jnp.zeros((2, 8, 4)), context=jnp.zeros((2, 4, 8)))
    state2, _ = step(state, teacher, batch, jnp.zeros((1, 4, 8)), jax.random.PRNGKey(0))
    diff = jax.tree.map(
        lambda t2, s: np.asarray(t2 - s), state2.target, state2.student
    )
    # with lr=0 and weight_decay... AdamW with lr=0 -> no update; target should be
    # 0.95*(s+1) + 0.05*s = s + 0.95
    np.testing.assert_allclose(jax.tree.leaves(diff)[0], 0.95, atol=1e-5)


def test_lcm_distill_sharded_on_mesh():
    apply_fn, teacher = _tiny_dit()
    cfg = LCMDistillConfig()
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    schedule = NoiseSchedule.linear()
    step = make_lcm_distill_step(apply_fn, schedule, cfg)
    mesh = make_mesh(8)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch = Batch(
        z=jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (16, 8, 4)), data),
        context=jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (16, 4, 8)), data),
    )
    state = jax.device_put(state, repl)
    teacher_r = jax.device_put(teacher, repl)
    with mesh:
        state2, metrics = jax.jit(step)(
            state, teacher_r, batch, jax.device_put(jnp.zeros((1, 4, 8)), repl),
            jax.random.PRNGKey(0),
        )
    assert np.isfinite(float(metrics["train/loss"]))


def test_teacher_step_loss_decreases():
    apply_fn, params = _tiny_dit()

    def apply_no_w(p, x, t, ctx, w=None):
        return apply_fn(p, x, t, ctx, None)

    cfg = TeacherConfig(learning_rate=1e-2, warmup_steps=1)
    state = init_teacher_state(params, cfg)
    step = jax.jit(make_teacher_step(apply_no_w, NoiseSchedule.linear(), cfg))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 8))
    first = last = None
    for i in range(10):
        state, metrics = step(state, z, ctx, jax.random.PRNGKey(0))  # fixed rng
        if first is None:
            first = float(metrics["train/loss"])
        last = float(metrics["train/loss"])
    assert last < first  # same batch+noise -> must overfit downward


def test_vae_gan_steps_run():
    # NOTE: the PatchGAN needs enough mel bins to survive its stride-2 stack
    # (each k4/p1 s1 layer also shrinks H by 1); 16 bins is the minimum for
    # n_layers=2, production uses 80.
    cfg_vae = VAEConfig(
        in_channels=16, out_ch=16, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        down_layers=(0,), attn_layers=(), kernel_size=5, z_channels=4, embed_dim=4,
    )
    vae = AutoencoderKL1D(cfg_vae)
    disc = NLayerDiscriminator2D(ndf=8, n_layers=2)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 32, 16))
    ae_params = vae.init(rng, mel, rng)["params"]
    disc_vars = disc.init(rng, jnp.zeros((2, 16, 32, 1)))
    cfg = VAEGANConfig(disc_start=0, learning_rate=1e-4)

    def vae_apply(params, x, r):
        moments = vae.apply({"params": params}, x, method=AutoencoderKL1D.encode_moments)
        post = DiagonalGaussian(moments)
        z = post.sample(r)
        recon = vae.apply({"params": params}, z, method=AutoencoderKL1D.decode)
        return recon, post

    def disc_apply(params, stats, x, train):
        if train:
            logits, updates = disc.apply(
                {"params": params, "batch_stats": stats}, x, True,
                mutable=["batch_stats"],
            )
            return logits, updates["batch_stats"]
        logits = disc.apply({"params": params, "batch_stats": stats}, x, False)
        return logits, stats

    gen_step, disc_step = make_vae_gan_steps(vae_apply, disc_apply, cfg)
    state = init_vae_gan_state(
        ae_params, disc_vars["params"], disc_vars["batch_stats"], cfg
    )
    state, gm = jax.jit(gen_step)(state, mel, rng)
    state, dm = jax.jit(disc_step)(state, mel, rng)
    for k in ("train/nll_loss", "train/kl_loss", "train/g_loss", "train/d_weight"):
        assert np.isfinite(float(gm[k])), k
    for k in ("train/disc_loss", "train/r1_penalty"):
        assert np.isfinite(float(dm[k])), k
    assert int(state.step) == 1


def test_lcm_distill_with_fsdp_sharded_params():
    """ZeRO-style sharding: all three DiT param trees sharded over the
    8-device mesh; the jitted distillation step must still run (XLA inserts
    the gathers)."""
    from audiolcm_tpu.parallel import shard_params_fsdp

    apply_fn, teacher = _tiny_dit()
    cfg = LCMDistillConfig()
    state = init_train_state(jax.tree.map(jnp.copy, teacher), cfg)
    schedule = NoiseSchedule.linear()
    step = make_lcm_distill_step(apply_fn, schedule, cfg)
    mesh = make_mesh(8)
    data = NamedSharding(mesh, P("data"))
    batch = Batch(
        z=jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (16, 8, 4)), data),
        context=jax.device_put(jax.random.normal(jax.random.PRNGKey(2), (16, 4, 8)), data),
    )
    # low min_size so the tiny test params actually shard
    teacher_s = shard_params_fsdp(teacher, mesh, min_size=64)
    state = state._replace(
        student=shard_params_fsdp(state.student, mesh, min_size=64),
        target=shard_params_fsdp(state.target, mesh, min_size=64),
    )
    with mesh:
        state2, metrics = jax.jit(step)(
            state, teacher_s, batch,
            jax.device_put(jnp.zeros((1, 4, 8)), NamedSharding(mesh, P())),
            jax.random.PRNGKey(0),
        )
    assert np.isfinite(float(metrics["train/loss"]))
    # updated student keeps its sharding
    sharded_leaves = [l for l in jax.tree.leaves(state2.student)
                      if len(l.sharding.device_set) == 8]
    assert sharded_leaves
