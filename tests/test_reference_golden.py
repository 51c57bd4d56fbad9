"""Direct-reference golden tests (VERDICT r3 weak #1).

The other golden tests re-derive the reference math in hand-written torch
replicas; a shared misreading would pass both sides. Here, the importable
reference modules themselves (loaded via tests/ref_loader.py — study/verify
only, nothing copied) produce the goldens: random torch-initialized
reference modules' OWN `state_dict()` is run through our converters and the
flax ports must match the reference forward end-to-end.

Covers: ConcatDiT2MLP (concatDiT.py:238), BigVGAN (vocoder/bigvgan/
models.py:133), MelNet (NAT_mel.py:42), LCMSampler schedule/step math
(scheduling_lcm.py), DDIMSolver (ddim_solver.py:11), AutoencoderKL 1D
(autoencoder1d.py:18), alias-free resampling (alias_free_torch),
Snake/SnakeBeta (activations.py), LitEma (ema.py:5), LambdaLinearScheduler
(lr_scheduler.py:81).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_loader import (
    load_reference,
    reference_available,
    set_librosa_mel_fn,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# ConcatDiT2MLP — full backbone forward, reference module's own state_dict
# ---------------------------------------------------------------------------

def test_ref_dit_full_forward(ref, rng):
    import torch

    from audiolcm_tpu.convert import convert_dit
    from audiolcm_tpu.models.dit import ConcatDiT2MLP

    in_ch, ctx_dim, hidden, depth, heads, max_len = 4, 16, 32, 2, 4, 64
    torch.manual_seed(0)
    tmodel = ref.concat_dit.ConcatDiT2MLP(
        in_channels=in_ch, context_dim=ctx_dim, hidden_size=hidden,
        depth=depth, num_heads=heads, max_len=max_len).eval()

    x = rng.standard_normal((2, in_ch, 12)).astype(np.float32)
    t = np.asarray([17, 503], dtype=np.int64)
    ctx = rng.standard_normal((2, 6, ctx_dim)).astype(np.float32)
    w = rng.standard_normal((2, 256)).astype(np.float32) * 0.1

    with torch.no_grad():
        golden_w = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                          torch.from_numpy(ctx),
                          w_cond=torch.from_numpy(w)).numpy()
        golden_nw = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                           torch.from_numpy(ctx)).numpy()

    sd = _np_sd(tmodel)
    model = ConcatDiT2MLP(in_channels=in_ch, context_dim=ctx_dim,
                          hidden_size=hidden, depth=depth, num_heads=heads,
                          max_len=max_len)
    params = {"params": jax.tree.map(jnp.asarray, convert_dit(sd, depth=depth))}
    ours_w = np.asarray(model.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(w))).transpose(0, 2, 1)
    ours_nw = np.asarray(model.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(ctx), None)).transpose(0, 2, 1)

    np.testing.assert_allclose(ours_w, golden_w, atol=3e-4)
    np.testing.assert_allclose(ours_nw, golden_nw, atol=3e-4)


# ---------------------------------------------------------------------------
# BigVGAN — reference module (weight_norm live) vs convert_bigvgan (folded)
# ---------------------------------------------------------------------------

def test_ref_bigvgan_forward(ref, rng):
    import types

    import torch

    from audiolcm_tpu.convert import convert_bigvgan
    from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig

    h = types.SimpleNamespace(
        num_mels=8, upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        upsample_initial_channel=32, resblock="1",
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        activation="snakebeta", snake_logscale=True)
    torch.manual_seed(0)
    tmodel = ref.bigvgan_models.BigVGAN(h).eval()
    # randomize the snake alpha/beta (init zeros would only test exp(0)=1)
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if name.endswith(".alpha") or name.endswith(".beta"):
                p.copy_(torch.randn_like(p) * 0.3)

    mel = rng.standard_normal((1, 8, 24)).astype(np.float32) * 0.5
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(mel)).numpy()[:, 0, :]

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    sd = _np_sd(tmodel)
    params = {"params": jax.tree.map(jnp.asarray, convert_bigvgan(
        sd, num_upsamples=2, num_kernels=2, dilations_per_block=3))}
    ours = np.asarray(BigVGAN(cfg).apply(
        params, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, golden, atol=5e-4)


# ---------------------------------------------------------------------------
# MelNet — reference STFT/pad/mag/log pipeline vs our MelSpectrogram.
# The librosa filterbank itself is stubbed with ours (cross-checked
# independently in test_mel.py against transformers.audio_utils).
# ---------------------------------------------------------------------------

def test_ref_melnet_pipeline(ref, rng):
    import torch

    from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram, mel_filterbank

    set_librosa_mel_fn(
        lambda sr, n_fft, n_mels, fmin, fmax: mel_filterbank(
            sr, n_fft, n_mels, fmin, fmax))
    hparams = {"fft_size": 1024, "audio_num_mel_bins": 80,
               "audio_sample_rate": 16000, "hop_size": 256,
               "win_size": 1024, "fmin": 0, "fmax": 8000}
    melnet = ref.nat_mel.MelNet(hparams)
    wav = (rng.standard_normal((2, 8000)).astype(np.float32) * 0.4).clip(-1, 1)
    try:
        with torch.no_grad():
            golden = melnet(torch.from_numpy(wav)).numpy()
    except RuntimeError:
        # newer torch requires return_complex=True: take the reference's
        # complex STFT and apply its own mel_basis + spectral_normalize
        with torch.no_grad():
            spec = melnet(torch.from_numpy(wav), complex=True)
            mag = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-9)
            golden = ref.nat_mel.spectral_normalize_torch(
                torch.matmul(melnet.mel_basis, mag)).numpy()

    ours = np.asarray(MelSpectrogram(MelConfig())(jnp.asarray(wav)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4)


# ---------------------------------------------------------------------------
# LCM sampler math — timestep grid, w-embedding, boundary scalings, step()
# ---------------------------------------------------------------------------

class _FakeLDM:
    num_timesteps = 1000


def test_ref_lcm_timestep_grid(ref):
    import torch

    from audiolcm_tpu.diffusion.lcm import lcm_inference_timesteps

    sampler = ref.scheduling_lcm.LCMSampler(_FakeLDM())
    for steps in (1, 2, 4, 8):
        sampler.set_timesteps(steps, device=torch.device("cpu"),
                              original_inference_steps=50)
        theirs = sampler.timesteps.numpy()
        ours = lcm_inference_timesteps(steps, 50)
        np.testing.assert_array_equal(ours, theirs)


def test_ref_guidance_scale_embedding(ref):
    import torch

    from audiolcm_tpu.nn.embeddings import guidance_scale_embedding

    sampler = ref.scheduling_lcm.LCMSampler(_FakeLDM())
    w = torch.tensor([4.0, 0.0, 11.0])
    theirs = sampler.get_guidance_scale_embedding(w, embedding_dim=256).numpy()
    ours = np.asarray(guidance_scale_embedding(jnp.asarray(w.numpy()), 256))
    # sin/cos at args up to w*1000=11000: torch and XLA use different f32
    # argument reductions (~5e-4 worst-case) — numerical, not structural
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_ref_boundary_scalings_and_step(ref):
    import torch

    from audiolcm_tpu.diffusion.lcm import boundary_scalings
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule

    sampler = ref.scheduling_lcm.LCMSampler(_FakeLDM())
    sched = NoiseSchedule.linear()
    acp = torch.from_numpy(np.asarray(sched.alphas_cumprod, dtype=np.float32))
    sampler.alphas_cumprod = acp  # bypass make_schedule's CUDA register
    sampler.set_timesteps(2, device=torch.device("cpu"),
                          original_inference_steps=50)

    for t in (999, 499, 19):
        cs_t, co_t = sampler.get_scalings_for_boundary_condition_discrete(t)
        cs_o, co_o = boundary_scalings(jnp.asarray(t))
        np.testing.assert_allclose(float(cs_o), cs_t, rtol=1e-6)
        np.testing.assert_allclose(float(co_o), co_t, rtol=1e-6)

    # step(): the denoised output (deterministic part) must equal our
    # c_out*x0_hat + c_skip*x_t blend with the same schedule
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 6)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 6)).astype(np.float32)
    for t in (999, 499):
        sampler._step_index = None
        _prev, denoised = sampler.step(
            torch.from_numpy(eps), t, torch.from_numpy(x), return_dict=False)
        a_t = float(sched.alphas_cumprod[t])
        x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        c_skip, c_out = boundary_scalings(jnp.asarray(t))
        ours = float(c_out) * x0 + float(c_skip) * x
        np.testing.assert_allclose(ours, denoised.numpy(), atol=1e-5)


def test_ref_ddim_solver(ref):
    import torch

    from audiolcm_tpu.diffusion.lcm import DDIMSolver
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule

    acp = np.asarray(NoiseSchedule.linear().alphas_cumprod, dtype=np.float64)
    theirs = ref.ddim_solver.DDIMSolver(acp)
    ours = DDIMSolver(acp)
    np.testing.assert_array_equal(ours.ddim_timesteps,
                                  theirs.ddim_timesteps.numpy())
    np.testing.assert_allclose(np.asarray(ours.ddim_alpha_cumprods),
                               theirs.ddim_alpha_cumprods.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.ddim_alpha_cumprods_prev),
                               theirs.ddim_alpha_cumprods_prev.numpy(),
                               rtol=1e-6)

    rng = np.random.default_rng(5)
    x0 = rng.standard_normal((2, 4, 6)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 6)).astype(np.float32)
    idx = np.asarray([3, 47])
    golden = theirs.ddim_step(torch.from_numpy(x0), torch.from_numpy(eps),
                              torch.from_numpy(idx)).numpy()
    mine = np.asarray(ours.ddim_step(jnp.asarray(x0), jnp.asarray(eps),
                                     jnp.asarray(idx)))
    np.testing.assert_allclose(mine, golden, atol=1e-5)


# ---------------------------------------------------------------------------
# AutoencoderKL 1D — reference module's own state_dict through convert_vae
# ---------------------------------------------------------------------------

def test_ref_vae_encode_decode(ref, rng):
    import torch

    from audiolcm_tpu.convert import convert_vae
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig

    ddconfig = {"double_z": True, "in_channels": 8, "out_ch": 8,
                "z_channels": 4, "kernel_size": 5, "ch": 32,
                "ch_mult": [1, 2], "num_res_blocks": 1, "attn_layers": [3],
                "down_layers": [0], "dropout": 0.0}
    torch.manual_seed(0)
    tmodel = ref.autoencoder1d.AutoencoderKL(
        embed_dim=4, ddconfig=ddconfig,
        lossconfig={"target": "torch.nn.Identity"}).eval()

    mel = rng.standard_normal((2, 8, 16)).astype(np.float32)
    with torch.no_grad():
        posterior = tmodel.encode(torch.from_numpy(mel))
        golden_moments = posterior.parameters.numpy()
        z = posterior.mode()
        golden_recon = tmodel.decode(z).numpy()

    cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1, down_layers=(0,), attn_layers=(3,),
                    kernel_size=5, z_channels=4, embed_dim=4)
    sd = _np_sd(tmodel)
    params = {"params": jax.tree.map(jnp.asarray, convert_vae(
        sd, num_levels=2, num_res_blocks=1, down_layers=(0,),
        attn_layers=(3,)))}
    model = AutoencoderKL1D(cfg)
    mel_btc = jnp.asarray(mel.transpose(0, 2, 1))
    moments = np.asarray(model.apply(params, mel_btc,
                                     method=AutoencoderKL1D.encode_moments))
    np.testing.assert_allclose(moments.transpose(0, 2, 1), golden_moments,
                               atol=3e-4)
    z_ours = jnp.asarray(z.numpy().transpose(0, 2, 1))
    recon = np.asarray(model.apply(params, z_ours,
                                   method=AutoencoderKL1D.decode))
    np.testing.assert_allclose(recon.transpose(0, 2, 1), golden_recon,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# Alias-free resampling + snake activations
# ---------------------------------------------------------------------------

def test_ref_alias_free_resample(ref, rng):
    import torch

    from audiolcm_tpu.nn.resample import (
        downsample1d,
        kaiser_sinc_filter1d,
        upsample1d,
    )

    filt = ref.alias_filter.kaiser_sinc_filter1d(0.25, 0.3, 12)
    np.testing.assert_allclose(kaiser_sinc_filter1d(0.25, 0.3, 12),
                               filt.numpy().ravel(), atol=1e-6)

    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    up = ref.alias_resample.UpSample1d(ratio=2)
    down = ref.alias_resample.DownSample1d(ratio=2)
    with torch.no_grad():
        golden_up = up(torch.from_numpy(x)).numpy()
        golden_down = down(torch.from_numpy(x)).numpy()
    x_btc = jnp.asarray(x.transpose(0, 2, 1))
    ours_up = np.asarray(upsample1d(x_btc, 2)).transpose(0, 2, 1)
    ours_down = np.asarray(downsample1d(x_btc, 2)).transpose(0, 2, 1)
    np.testing.assert_allclose(ours_up, golden_up, atol=1e-5)
    np.testing.assert_allclose(ours_down, golden_down, atol=1e-5)


def test_ref_activation1d_snakebeta(ref, rng):
    import torch

    from audiolcm_tpu.nn.resample import alias_free_activation
    from audiolcm_tpu.nn.snake import snake_beta

    c = 6
    torch.manual_seed(1)
    act = ref.activations.SnakeBeta(c, alpha_logscale=True)
    with torch.no_grad():
        act.alpha.copy_(torch.randn(c) * 0.3)
        act.beta.copy_(torch.randn(c) * 0.3)
    mod = ref.alias_free.Activation1d(activation=act)
    x = rng.standard_normal((2, c, 40)).astype(np.float32)
    with torch.no_grad():
        golden = mod(torch.from_numpy(x)).numpy()

    alpha = jnp.exp(jnp.asarray(act.alpha.detach().numpy()))
    beta = jnp.exp(jnp.asarray(act.beta.detach().numpy()))
    ours = np.asarray(alias_free_activation(
        jnp.asarray(x.transpose(0, 2, 1)),
        lambda v: snake_beta(v, alpha, beta))).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


# ---------------------------------------------------------------------------
# LitEma + LambdaLinearScheduler
# ---------------------------------------------------------------------------

def test_ref_litema_decay_sequence(ref):
    import torch
    import torch.nn as nn

    from audiolcm_tpu.train.ema import ema_init, ema_update

    torch.manual_seed(0)
    m = nn.Linear(3, 3)
    ema = ref.ema.LitEma(m, decay=0.9999)
    state = ema_init({"w": jnp.asarray(m.weight.detach().numpy())})
    for step in range(5):
        with torch.no_grad():
            m.weight.add_(torch.ones_like(m.weight) * 0.1)
        ema(m)
        state = ema_update(
            state, {"w": jnp.asarray(m.weight.detach().numpy())})
    shadow = dict(ema.named_buffers())["weight"].numpy()
    np.testing.assert_allclose(np.asarray(state.params["w"]), shadow,
                               atol=1e-6)


def test_ref_lambda_linear_scheduler(ref):
    from audiolcm_tpu.train.lcm_distill import lambda_linear_schedule

    sched = ref.lr_scheduler.LambdaLinearScheduler(
        warm_up_steps=[10000], cycle_lengths=[10000000000000],
        f_start=[1.0e-6], f_max=[1.0], f_min=[1.0])
    ours = lambda_linear_schedule(1.0, 10000)
    for n in (0, 1, 100, 9999, 10000, 50000):
        np.testing.assert_allclose(float(ours(jnp.asarray(n))),
                                   sched.schedule(n), rtol=1e-5)
