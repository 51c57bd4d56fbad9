"""Full-DiT numerics golden test.

Reconstructs the documented ConcatDiT2MLP math (SURVEY.md §2.3 /
concatDiT.py:238-304) as a FUNCTIONAL torch computation straight off a
torch-layout state dict (no module tree), runs the same weights through
convert_dit + our flax model, and requires end-to-end agreement. This pins
every converter layout rule and the op ORDER (t-token position, context
chunking, pos-emb add point, prefix slice) at once.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert import convert_dit
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from tests.test_convert import _synthetic_dit_sd


def torch_dit_forward(sd, x_bct, t, ctx, w_cond, depth, heads):
    """Functional torch evaluation of the documented architecture.

    x_bct: (B, C, T) torch tensor; ctx: (B, 2L, ctx_dim); returns (B, C, T).
    """
    import torch
    import torch.nn.functional as F

    g = lambda name: torch.from_numpy(sd[name])

    # timestep embedding: [cos|sin], divisor=half (GLIDE formula)
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    t_freq = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    t_freq = t_freq + w_cond @ g("t_embedder.proj_w.weight").T
    t_emb = F.silu(t_freq @ g("t_embedder.mlp.0.weight").T + g("t_embedder.mlp.0.bias"))
    t_emb = t_emb @ g("t_embedder.mlp.2.weight").T + g("t_embedder.mlp.2.bias")

    def cond_embed(prefix, c):
        h = c @ g(f"{prefix}.mlp.0.weight").T + g(f"{prefix}.mlp.0.bias")
        h = F.gelu(h, approximate="tanh")
        h = h @ g(f"{prefix}.mlp.2.weight").T + g(f"{prefix}.mlp.2.bias")
        return F.layer_norm(h, h.shape[-1:], g(f"{prefix}.mlp.3.weight"),
                            g(f"{prefix}.mlp.3.bias"))

    c1, c2 = ctx.chunk(2, dim=1)
    cond = torch.cat([cond_embed("c1_embedder", c1), cond_embed("c2_embedder", c2)], dim=1)
    extra = cond.shape[1] + 1

    h = F.conv1d(x_bct, g("proj_in.weight"), g("proj_in.bias"), padding=2)
    h = h.permute(0, 2, 1)  # (B, T, D)
    h = torch.cat([t_emb[:, None, :], cond, h], dim=1)
    h = h + g("pos_emb.weight")[None, : h.shape[1], :]

    def attention(prefix, z):
        q = z @ g(f"{prefix}.to_q.weight").T
        k = z @ g(f"{prefix}.to_k.weight").T
        v = z @ g(f"{prefix}.to_v.weight").T
        b, n, d = q.shape
        hd = d // heads
        split = lambda a: a.view(b, n, heads, hd).permute(0, 2, 1, 3)
        logits = split(q) @ split(k).transpose(-1, -2) * hd**-0.5
        out = torch.softmax(logits, dim=-1) @ split(v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, d)
        return out @ g(f"{prefix}.to_out.0.weight").T + g(f"{prefix}.to_out.0.bias")

    for i in range(depth):
        bp = f"blocks.{i}"
        zin = h.permute(0, 2, 1)  # (B, D, N)
        z = F.group_norm(zin, 32, g(f"{bp}.norm.weight"), g(f"{bp}.norm.bias"), eps=1e-6)
        z = F.conv1d(z, g(f"{bp}.proj_in.weight"), g(f"{bp}.proj_in.bias"))
        z = z.permute(0, 2, 1)
        tb = f"{bp}.transformer_blocks.0"
        ln = lambda name, a: F.layer_norm(a, a.shape[-1:], g(f"{name}.weight"),
                                          g(f"{name}.bias"))
        z = z + attention(f"{tb}.attn1", ln(f"{tb}.norm1", z))
        z = z + attention(f"{tb}.attn2", ln(f"{tb}.norm2", z))
        ff_in = ln(f"{tb}.norm3", z).permute(0, 2, 1)
        ff = F.conv1d(ff_in, g(f"{tb}.ff.net.0.proj.weight"),
                      g(f"{tb}.ff.net.0.proj.bias"), padding=4)
        val, gate = ff.chunk(2, dim=1)
        ff = val * F.gelu(gate)
        ff = F.conv1d(ff, g(f"{tb}.ff.net.2.weight"), g(f"{tb}.ff.net.2.bias"), padding=4)
        z = z + ff.permute(0, 2, 1)
        z = z.permute(0, 2, 1)
        z = F.conv1d(z, g(f"{bp}.proj_out.weight"), g(f"{bp}.proj_out.bias"))
        h = (z + zin).permute(0, 2, 1)

    h = h[:, extra:, :].permute(0, 2, 1)
    h = F.group_norm(h, 16, g("final_layer.norm_final.weight"),
                     g("final_layer.norm_final.bias"))
    return F.conv1d(h, g("final_layer.conv1d.weight"), g("final_layer.conv1d.bias"))


def test_full_dit_matches_torch_functional(rng):
    import torch

    in_ch, ctx_dim, hidden, depth, heads, max_len = 4, 16, 32, 2, 4, 64
    sd = _synthetic_dit_sd(in_ch, ctx_dim, hidden, depth, max_len)
    # scale down to keep activations tame through depth
    sd = {k: (v * 0.2 if v.ndim > 1 else v * 0.1) for k, v in sd.items()}
    # proj_out must be non-zero to exercise blocks
    x = rng.standard_normal((2, in_ch, 12)).astype(np.float32)
    t = np.asarray([17, 503], dtype=np.int64)
    ctx = rng.standard_normal((2, 6, ctx_dim)).astype(np.float32)
    w = rng.standard_normal((2, 256)).astype(np.float32) * 0.1

    golden = torch_dit_forward(
        sd, torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx),
        torch.from_numpy(w), depth, heads,
    ).numpy()

    model = ConcatDiT2MLP(in_channels=in_ch, context_dim=ctx_dim,
                          hidden_size=hidden, depth=depth, num_heads=heads,
                          max_len=max_len)
    params = {"params": jax.tree.map(jnp.asarray, convert_dit(sd, depth=depth))}
    ours = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(w),
    )
    ours = np.asarray(ours).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, golden, atol=2e-4)
