"""VAE loss-variant parity tests: multi-window discriminator, 1D patch
discriminators, ActNorm, LPAPS, and the variant GAN steps
(contperceptual_{multiw,dis,mask}.py, vqperceptual.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiolcm_tpu.models.discriminators import (
    ActNorm,
    NLayerDiscriminator1dFeats,
    NLayerDiscriminator1dSpecs,
    NLayerDiscriminator2D,
    actnorm_init_variables,
)
from audiolcm_tpu.models.lpaps import LPAPS, lpaps_params_from_torch
from audiolcm_tpu.models.multi_window_disc import MultiWindowDiscriminatorWrapper
from audiolcm_tpu.train.vae_losses_extra import (
    VariantConfig,
    init_variant_state,
    make_variant_gan_steps,
    mel_lengths_from_pad,
    sequence_mask,
)


def test_multi_window_disc_stack_reduction():
    # contperceptual_multiw.py:27 config: bn, reduction='stack'
    m = MultiWindowDiscriminatorWrapper(
        time_lengths=(16, 32, 64), hidden_size=16, norm_type="bn",
        reduction="stack")
    mel = jnp.ones((2, 128, 80))
    variables = m.init(
        {"params": jax.random.key(0), "windows": jax.random.key(1)},
        mel, train=False)
    out = m.apply(variables, mel, train=False,
                  rngs={"windows": jax.random.key(2)})
    assert out["y"].shape == (2, 1, 3)  # (B, 1, n_windows)
    assert len(out["h"]) == 9  # 3 windows x 3 blocks


def test_multi_window_disc_drops_oversized_windows():
    # windows longer than T are skipped, like the reference's clip()->None
    m = MultiWindowDiscriminatorWrapper(
        time_lengths=(16, 1024), hidden_size=8, norm_type="in",
        reduction="stack")
    mel = jnp.ones((2, 64, 80))
    variables = m.init(
        {"params": jax.random.key(0), "windows": jax.random.key(1)},
        mel, train=False)
    out = m.apply(variables, mel, train=False,
                  rngs={"windows": jax.random.key(2)})
    assert out["y"].shape == (2, 1, 1)


def test_multi_window_conditional_tower():
    m = MultiWindowDiscriminatorWrapper(
        time_lengths=(16,), hidden_size=8, cond_size=12, uncond_disc=False,
        reduction="sum")
    mel = jnp.ones((2, 64, 80))
    cond = jnp.ones((2, 64, 12))
    variables = m.init(
        {"params": jax.random.key(0), "windows": jax.random.key(1)},
        mel, cond=cond, train=False)
    out = m.apply(variables, mel, cond=cond, train=False,
                  rngs={"windows": jax.random.key(2)})
    assert out["y"] is None and out["y_c"].shape == (2, 1)


def test_1d_discriminators_and_actnorm():
    feats = NLayerDiscriminator1dFeats(input_nc=256, n_layers=2)
    v = feats.init({"params": jax.random.key(0)}, jnp.zeros((2, 64, 256)),
                   train=False)
    out, _ = feats.apply(v, jnp.ones((2, 64, 256)), train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(0)})
    assert out.shape[0] == 2 and out.shape[-1] == 1

    specs = NLayerDiscriminator1dSpecs(use_actnorm=True)
    v = specs.init({"params": jax.random.key(0)}, jnp.zeros((2, 128, 80)),
                   train=False)
    # 128 -> 3x stride-2 (k4 p1) -> 16, then two s1 k4 p1 convs -> 14
    assert specs.apply(v, jnp.ones((2, 128, 80)), train=False).shape == (2, 14, 1)

    # ActNorm data-dependent init normalizes the init batch
    x = jax.random.normal(jax.random.key(0), (4, 6, 3)) * 2.0 + 1.0
    stats = actnorm_init_variables(x)
    an = ActNorm(3)
    out = an.apply({"params": stats}, x)
    np.testing.assert_allclose(np.mean(np.asarray(out), axis=(0, 1)), 0.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(out), axis=(0, 1), ddof=1),
                               1.0, atol=1e-3)
    # reverse inverts
    rec = an.apply({"params": stats}, out, reverse=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_lpaps_forward_and_converter():
    torch = pytest.importorskip("torch")
    # synthetic torch-layout state dict exercising the key mapping
    sd = {}
    fi, ci, c_in = 0, 0, 1
    plan = (64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP",
            512, 512, 512, "MP", 512, 512, 512)
    sl = lambda f: (1 if f < 4 else 2 if f < 9 else 3 if f < 16
                    else 4 if f < 23 else 5)
    g = torch.Generator().manual_seed(0)
    for item in plan:
        if item == "MP":
            fi += 1
            continue
        sd[f"net.slice{sl(fi)}.{fi}.weight"] = torch.randn(
            (item, c_in, 3, 3), generator=g) * 0.05
        sd[f"net.slice{sl(fi)}.{fi}.bias"] = torch.zeros(item)
        c_in = item
        fi += 2
        ci += 1
    for k, ch in enumerate((64, 128, 256, 512, 512)):
        sd[f"lin{k}.model.1.weight"] = torch.rand((1, ch, 1, 1), generator=g)
    sd["scaling_layer.shift"] = torch.zeros((1, 1, 80, 1))
    sd["scaling_layer.scale"] = torch.ones((1, 1, 80, 1))

    variables = lpaps_params_from_torch(sd)
    model = LPAPS()
    x = jax.random.normal(jax.random.key(0), (2, 80, 64, 1))
    d_same = model.apply(variables, x, x)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    d_diff = model.apply(variables, x, x + 0.3)
    assert float(jnp.min(d_diff)) > 0.0


def test_sequence_mask_and_lengths():
    mel = jnp.full((2, 8, 4), -1.0)
    mel = mel.at[0, :5].set(0.5)
    mel = mel.at[1, :2].set(0.1)
    lens = mel_lengths_from_pad(mel, pad_value=-1.0)
    np.testing.assert_array_equal(np.asarray(lens), [5, 2])
    m = sequence_mask(lens, 8)
    assert m.shape == (2, 8) and bool(m[0, 4]) and not bool(m[0, 5])


def _tiny_vae_apply(params, mel, rng):
    class _Post:
        def __init__(self, mean):
            self.mean = mean

        def kl(self):
            return 0.5 * jnp.sum(self.mean**2, axis=(1, 2))

    recon = mel * params["w"] + params["b"]
    return recon, _Post(recon * 0.1)


@pytest.mark.parametrize("variant", ["multiw", "dis", "mask", "vq"])
def test_variant_gan_steps_run(variant):
    B, T, F = 2, 64, 80
    mel = jax.random.normal(jax.random.key(0), (B, T, F))
    ae_params = {"w": jnp.ones(()) * 0.9, "b": jnp.zeros(())}

    patch = NLayerDiscriminator2D(ndf=8, n_layers=2)
    patch_vars = patch.init({"params": jax.random.key(1)},
                            jnp.zeros((B, F, T, 1)), train=False)
    multi = MultiWindowDiscriminatorWrapper(
        time_lengths=(16, 32), hidden_size=8,
        norm_type="in" if variant == "dis" else "bn", reduction="stack")
    multi_vars = multi.init(
        {"params": jax.random.key(2), "windows": jax.random.key(3)},
        jnp.zeros((B, T, F)), train=False)

    def patch_apply(p, x):
        return patch.apply({"params": p["params"],
                            "batch_stats": patch_vars["batch_stats"]},
                           x, train=False)

    def multi_apply(p, x, rng):
        vs = {"params": p["params"]}
        if "batch_stats" in multi_vars:
            vs["batch_stats"] = multi_vars["batch_stats"]
        return multi.apply(vs, x, train=False, rngs={"windows": rng})["y"]

    cfg = VariantConfig(variant=variant, disc_start=0, disc_factor=1.0,
                        kl_weight=1e-6)
    disc_params = {}
    if variant in ("dis", "mask", "vq"):
        disc_params["patch"] = {"params": patch_vars["params"]}
    if variant in ("multiw", "dis"):
        disc_params["multi"] = {"params": multi_vars["params"]}

    gen_step, disc_step = make_variant_gan_steps(
        _tiny_vae_apply, cfg,
        patch_disc_apply=lambda p, x: patch_apply(p, x),
        multi_disc_apply=lambda p, x, r: multi_apply(p, x, r),
        last_layer_get=lambda p: p["w"],
        last_layer_set=lambda p, v: {**p, "w": v},
    )
    state = init_variant_state(ae_params, disc_params, cfg)
    kw = {}
    if variant == "vq":
        kw["codebook_loss"] = jnp.array(0.25)
    state2, gm = jax.jit(gen_step, static_argnames=())(
        state, mel, jax.random.key(4), **kw) if variant != "vq" else gen_step(
        state, mel, jax.random.key(4), **kw)
    assert np.isfinite(float(gm["train/total_loss"]))
    assert float(jnp.abs(state2.ae_params["w"] - ae_params["w"])) > 0
    state3, dm = disc_step(state2, mel, jax.random.key(5))
    assert np.isfinite(float(dm["train/disc_loss_total"]))
    assert int(state3.step) == 1
    if variant == "vq":
        assert "train/quant_loss" in gm
    if variant == "dis":
        assert "train/disc_loss_multi" in dm and "train/disc_loss" in dm
