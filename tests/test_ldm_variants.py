"""Inpaint/order LDM and noisy-latent classifier training steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolcm_tpu.diffusion.schedule import NoiseSchedule
from audiolcm_tpu.train.ldm_variants import (
    ClassifierConfig,
    build_inpaint_cond,
    init_classifier_state,
    make_classifier_step,
    make_inpaint_step,
    make_order_step,
    noisy_accuracy_sweep,
    resize_mask_nearest,
    top_k_accuracy,
)
from audiolcm_tpu.train.teacher import TeacherConfig, TeacherState, make_teacher_optimizer


def _schedule():
    return NoiseSchedule.linear(20, 0.0015, 0.0195)


def test_resize_mask_matches_torch_nearest(rng):
    torch = pytest.importorskip("torch")
    mask = rng.random((2, 1, 13)).astype(np.float32)
    for target in (5, 13, 29):
        ours = np.asarray(resize_mask_nearest(jnp.asarray(mask), target))
        golden = torch.nn.functional.interpolate(
            torch.from_numpy(mask), size=(target,)).numpy()
        np.testing.assert_allclose(ours, golden)


def test_inpaint_step_runs(rng):
    sched = _schedule()
    cfg = TeacherConfig(learning_rate=1e-3, warmup_steps=1)
    z_ch, t_lat = 4, 16

    params = {"w": jnp.ones((2 * z_ch + 1, z_ch)) * 0.01}

    def dit_apply(p, x_cat, t, ctx):
        # (B, 2C+1, T') -> (B, C, T'): channel mix, ctx ignored in the stub
        return jnp.einsum("bct,cd->bdt", x_cat, p["w"])

    step = jax.jit(make_inpaint_step(dit_apply, sched, cfg))
    opt = make_teacher_optimizer(cfg)
    state = TeacherState(jnp.zeros((), jnp.int32), params, opt.init(params))

    z = jnp.asarray(rng.standard_normal((2, z_ch, t_lat)), jnp.float32)
    masked_latent = jnp.asarray(rng.standard_normal((2, z_ch, t_lat)),
                                jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (2, 1, 64)), jnp.float32)
    c_concat = build_inpaint_cond(masked_latent, mask)
    assert c_concat.shape == (2, z_ch + 1, t_lat)

    state2, metrics = step(state, z, c_concat, jnp.zeros((2, 3, 8)),
                           jax.random.key(0))
    assert np.isfinite(float(metrics["train/loss"]))
    assert float(jnp.abs(state2.params["w"] - params["w"]).max()) > 0
    assert int(state2.step) == 1


def test_order_step_with_order_dit(rng):
    from audiolcm_tpu.models.order_dit import ConcatOrderDiT

    sched = _schedule()
    dit = ConcatOrderDiT(in_channels=4, context_dim=8, hidden_size=32,
                         depth=1, num_heads=2, max_len=32)
    x = jnp.zeros((2, 16, 4))
    tok = jnp.zeros((2, 6, 8))
    order = jnp.zeros((2, 6), jnp.int32)
    params = dit.init(jax.random.key(0), x, jnp.zeros((2,), jnp.int32), tok,
                      order)["params"]

    def apply(p, z, t, token_emb, order_index):
        # our latents here are (B, C, T'); the DiT is channels-last
        out = dit.apply({"params": p}, jnp.swapaxes(z, 1, 2), t, token_emb,
                        order_index)
        return jnp.swapaxes(out, 1, 2)

    cfg = TeacherConfig(learning_rate=1e-3, warmup_steps=1)
    step = jax.jit(make_order_step(apply, sched, cfg))
    opt = make_teacher_optimizer(cfg)
    state = TeacherState(jnp.zeros((), jnp.int32), params, opt.init(params))
    z = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    state2, metrics = step(state, z, tok, order, jax.random.key(1))
    assert np.isfinite(float(metrics["train/loss_simple"]))
    assert int(state2.step) == 1


def test_top_k_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (6,))
    for k in (1, 5):
        ours = float(top_k_accuracy(jnp.asarray(logits), jnp.asarray(labels), k))
        _, top = torch.topk(torch.from_numpy(logits), k, dim=1)
        golden = (top == torch.from_numpy(labels)[:, None]).float().sum(-1).mean()
        np.testing.assert_allclose(ours, float(golden))


def test_classifier_step_and_sweep(rng):
    sched = _schedule()
    cfg = ClassifierConfig(num_classes=5, learning_rate=1e-2)

    def classifier_apply(p, x_noisy, t):
        feat = jnp.mean(x_noisy, axis=-1)  # (B, C)
        return feat @ p["w"] + t[:, None].astype(jnp.float32) * 0.0

    params = {"w": jnp.asarray(rng.standard_normal((4, 5)), jnp.float32) * 0.1}
    step = jax.jit(make_classifier_step(classifier_apply, sched, cfg))
    state = init_classifier_state(params, cfg)
    z = jnp.asarray(rng.standard_normal((8, 4, 16)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, (8,)))
    state2, metrics = step(state, z, targets, jax.random.key(0))
    assert np.isfinite(float(metrics["train/loss"]))
    assert 0.0 <= float(metrics["train/acc@5"]) <= 1.0

    sweep = noisy_accuracy_sweep(classifier_apply, state2.params, z, targets,
                                 sched, jax.random.key(1), log_every_t=10)
    assert sorted(sweep) == [0, 10]
    assert all(0.0 <= v["acc@1"] <= 1.0 for v in sweep.values())
