"""Full BigVGAN numerics golden test: functional torch re-derivation with
weight_norm semantics (SURVEY.md §2.6 / vocoder/bigvgan/models.py) vs
convert_bigvgan (which folds weight_norm) + our flax generator."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert import convert_bigvgan
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from tests.test_convert import _synthetic_bigvgan_sd


def _wn(sd, p):
    """weight_norm: w = g * v / ||v|| over dims 1.. (torch semantics)."""
    import torch

    g = torch.from_numpy(sd[f"{p}.weight_g"])
    v = torch.from_numpy(sd[f"{p}.weight_v"])
    norm = v.flatten(1).norm(dim=1).view(-1, *([1] * (v.dim() - 1)))
    return g * v / norm


def _alias_act(x, alpha, beta):
    """Activation1d: kaiser up2x -> snakebeta -> down2x (torch functional)."""
    import torch
    import torch.nn.functional as F

    from tests.test_vocoder import _torch_kaiser_sinc

    c = x.shape[1]
    filt = _torch_kaiser_sinc(0.25, 0.3, 12).view(1, 1, 12)
    xp = F.pad(x, (5, 5), mode="replicate")
    up = 2 * F.conv_transpose1d(xp, filt.expand(c, -1, -1), stride=2, groups=c)
    up = up[..., 15:-15]
    a = alpha.view(1, -1, 1)
    b = beta.view(1, -1, 1)
    up = up + (1.0 / (b + 1e-9)) * torch.sin(up * a) ** 2
    upp = F.pad(up, (5, 6), mode="replicate")
    return F.conv1d(upp, filt.expand(c, -1, -1), stride=2, groups=c)


def torch_bigvgan_forward(sd, mel_bct, cfg: BigVGANConfig):
    import torch
    import torch.nn.functional as F

    g = lambda n: torch.from_numpy(sd[n])
    x = F.conv1d(mel_bct, _wn(sd, "conv_pre"), g("conv_pre.bias"), padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, kk) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = F.conv_transpose1d(x, _wn(sd, f"ups.{i}.0"), g(f"ups.{i}.0.bias"),
                               stride=u, padding=(kk - u) // 2)
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            r = f"resblocks.{i * nk + j}"
            h_res = x
            for m, d in enumerate(rd):
                a = _alias_act(h_res,
                               torch.exp(g(f"{r}.activations.{2 * m}.act.alpha")),
                               torch.exp(g(f"{r}.activations.{2 * m}.act.beta")))
                a = F.conv1d(a, _wn(sd, f"{r}.convs1.{m}"), g(f"{r}.convs1.{m}.bias"),
                             padding=(rk * d - d) // 2, dilation=d)
                a = _alias_act(a,
                               torch.exp(g(f"{r}.activations.{2 * m + 1}.act.alpha")),
                               torch.exp(g(f"{r}.activations.{2 * m + 1}.act.beta")))
                a = F.conv1d(a, _wn(sd, f"{r}.convs2.{m}"), g(f"{r}.convs2.{m}.bias"),
                             padding=(rk - 1) // 2)
                h_res = h_res + a
            acc = h_res if acc is None else acc + h_res
        x = acc / nk
    x = _alias_act(x, torch.exp(g("activation_post.act.alpha")),
                   torch.exp(g("activation_post.act.beta")))
    x = F.conv1d(x, _wn(sd, "conv_post"), g("conv_post.bias"), padding=3)
    return torch.tanh(x)


def test_full_bigvgan_matches_torch_functional(rng):
    import torch

    cfg = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    sd = {k: v * 0.3 for k, v in _synthetic_bigvgan_sd(cfg).items()}
    mel = rng.standard_normal((1, 8, 24)).astype(np.float32) * 0.5

    golden = torch_bigvgan_forward(sd, torch.from_numpy(mel), cfg).numpy()[:, 0, :]

    model = BigVGAN(cfg)
    params = {"params": jax.tree.map(jnp.asarray, convert_bigvgan(
        sd, num_upsamples=2, num_kernels=2, dilations_per_block=2))}
    ours = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, golden, atol=5e-4)
