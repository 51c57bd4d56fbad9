"""Full 1D-VAE numerics golden test: functional torch re-derivation of the
documented architecture (SURVEY.md §2.4 / autoencoder1d.py) vs convert_vae
+ our flax model, on the same random torch-layout weights."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert import convert_vae
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig
from tests.test_convert import _synthetic_vae_sd


def _res(sd, p, x, k):
    import torch.nn.functional as F
    import torch

    g = lambda n: torch.from_numpy(sd[f"{p}.{n}"])
    h = F.group_norm(x, 32, g("norm1.weight"), g("norm1.bias"), eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv1d(h, g("conv1.weight"), g("conv1.bias"), padding=k // 2)
    h = F.group_norm(h, 32, g("norm2.weight"), g("norm2.bias"), eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv1d(h, g("conv2.weight"), g("conv2.bias"), padding=k // 2)
    if f"{p}.nin_shortcut.weight" in sd:
        x = F.conv1d(x, g("nin_shortcut.weight"), g("nin_shortcut.bias"))
    return x + h


def _attn(sd, p, x):
    import torch
    import torch.nn.functional as F

    g = lambda n: torch.from_numpy(sd[f"{p}.{n}"])
    h = F.group_norm(x, 32, g("norm.weight"), g("norm.bias"), eps=1e-6)
    q = F.conv1d(h, g("q.weight"), g("q.bias"))
    k = F.conv1d(h, g("k.weight"), g("k.bias"))
    v = F.conv1d(h, g("v.weight"), g("v.bias"))
    c = q.shape[1]
    w = torch.bmm(q.permute(0, 2, 1), k) * c**-0.5  # channels^-0.5 (ref quirk)
    w = torch.softmax(w, dim=2)
    h = torch.bmm(v, w.permute(0, 2, 1))
    return x + F.conv1d(h, g("proj_out.weight"), g("proj_out.bias"))


def torch_vae_forward(sd, mel_bct, cfg: VAEConfig):
    """mel (B, 80, T) -> moments (B, 2*embed, T/2) and recon of mode z."""
    import torch
    import torch.nn.functional as F

    g = lambda n: torch.from_numpy(sd[n])
    k = cfg.kernel_size
    h = F.conv1d(mel_bct, g("encoder.conv_in.weight"), g("encoder.conv_in.bias"),
                 padding=k // 2)
    for i in range(len(cfg.ch_mult)):
        for j in range(cfg.num_res_blocks):
            h = _res(sd, f"encoder.down.{i}.block.{j}", h, k)
        if i in cfg.down_layers:
            h = F.pad(h, (0, 1))
            h = F.conv1d(h, g(f"encoder.down.{i}.downsample.conv.weight"),
                         g(f"encoder.down.{i}.downsample.conv.bias"), stride=2)
    h = _res(sd, "encoder.mid.block_1", h, k)
    h = _attn(sd, "encoder.mid.attn_1", h)
    h = _res(sd, "encoder.mid.block_2", h, k)
    h = F.group_norm(h, 32, g("encoder.norm_out.weight"), g("encoder.norm_out.bias"),
                     eps=1e-6)
    h = h * torch.sigmoid(h)
    h = F.conv1d(h, g("encoder.conv_out.weight"), g("encoder.conv_out.bias"),
                 padding=k // 2)
    moments = F.conv1d(h, g("quant_conv.weight"), g("quant_conv.bias"))

    z = moments[:, : cfg.embed_dim]  # posterior mode
    h = F.conv1d(z, g("post_quant_conv.weight"), g("post_quant_conv.bias"))
    h = F.conv1d(h, g("decoder.conv_in.weight"), g("decoder.conv_in.bias"),
                 padding=k // 2)
    h = _res(sd, "decoder.mid.block_1", h, 3)  # decoder blocks use k=3 (ref quirk)
    h = _attn(sd, "decoder.mid.attn_1", h)
    h = _res(sd, "decoder.mid.block_2", h, 3)
    up_layers = [i + 1 for i in cfg.down_layers]
    for i in reversed(range(len(cfg.ch_mult))):
        for j in range(cfg.num_res_blocks + 1):
            h = _res(sd, f"decoder.up.{i}.block.{j}", h, 3)
        if i in up_layers:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = F.conv1d(h, g(f"decoder.up.{i}.upsample.conv.weight"),
                         g(f"decoder.up.{i}.upsample.conv.bias"), padding=1)
    h = F.group_norm(h, 32, g("decoder.norm_out.weight"), g("decoder.norm_out.bias"),
                     eps=1e-6)
    h = h * torch.sigmoid(h)
    recon = F.conv1d(h, g("decoder.conv_out.weight"), g("decoder.conv_out.bias"),
                     padding=k // 2)
    return moments, recon


def test_full_vae_matches_torch_functional(rng):
    import torch

    cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                    down_layers=(0,), attn_layers=(), kernel_size=5, z_channels=4,
                    embed_dim=4)
    sd = {k: v * 0.2 for k, v in _synthetic_vae_sd(cfg).items()}
    mel = rng.standard_normal((2, 8, 16)).astype(np.float32)

    g_moments, g_recon = torch_vae_forward(sd, torch.from_numpy(mel), cfg)

    model = AutoencoderKL1D(cfg)
    params = {"params": jax.tree.map(jnp.asarray, convert_vae(
        sd, num_levels=2, num_res_blocks=1, down_layers=(0,), attn_layers=()))}
    mel_btc = jnp.asarray(mel.transpose(0, 2, 1))
    moments = model.apply(params, mel_btc, method=AutoencoderKL1D.encode_moments)
    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 2, 1), g_moments.numpy(), atol=2e-4
    )
    z = moments[..., : cfg.embed_dim]
    recon = model.apply(params, z, method=AutoencoderKL1D.decode)
    np.testing.assert_allclose(
        np.asarray(recon).transpose(0, 2, 1), g_recon.numpy(), atol=5e-4
    )
