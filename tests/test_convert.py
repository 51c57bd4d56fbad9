"""Converter validation.

Strategy: full-model numerics for BERT/T5 live in test_text_encoders (HF is
the reference impl). For DiT/VAE/BigVGAN — whose torch sources we must not
replicate — we validate in two layers:
  1. generic op-level goldens (torch Conv1d/GroupNorm/attention vs our flax
     modules under converted weights), which pin every layout rule the
     converters use;
  2. structural equivalence: converting a synthetic torch-layout state dict
     must produce exactly the tree (names + shapes) that flax init builds.
"""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.convert import convert_bigvgan, convert_dit, convert_vae, fold_weight_norm
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.dit import ConcatDiT2MLP
from audiolcm_tpu.models.vae1d import AutoencoderKL1D, VAEConfig


def _tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_spec(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def _torch_layout_from_spec(flax_spec_to_torch):
    """Build a random torch-layout sd given {torch_name: shape}."""
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(s).astype(np.float32) for k, s in flax_spec_to_torch.items()}


def test_conv1d_converted_weights_match_torch(rng):
    import torch
    import torch.nn.functional as F

    import flax.linen as nn

    cin, cout, k = 6, 10, 5
    x = rng.standard_normal((2, 16, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    golden = (
        F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
                 torch.from_numpy(b), padding=k // 2)
        .numpy().transpose(0, 2, 1)
    )
    conv = nn.Conv(cout, kernel_size=(k,), padding=[(k // 2, k // 2)])
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_dilated_conv1d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    import flax.linen as nn

    cin = cout = 4
    k, d = 3, 5
    pad = (k * d - d) // 2
    x = rng.standard_normal((1, 32, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    golden = (
        F.conv1d(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
                 padding=pad, dilation=d)
        .numpy().transpose(0, 2, 1)
    )
    conv = nn.Conv(cout, kernel_size=(k,), padding=[(pad, pad)], kernel_dilation=(d,),
                   use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0))}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    import torch

    import flax.linen as nn

    c, groups = 32, 8
    x = rng.standard_normal((2, 12, c)).astype(np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    golden = (
        torch.nn.functional.group_norm(
            torch.from_numpy(x.transpose(0, 2, 1)), groups,
            torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-6,
        ).numpy().transpose(0, 2, 1)
    )
    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6)
    params = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_fold_weight_norm(rng):
    import torch

    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(sd, "c")
    conv2 = torch.nn.utils.remove_weight_norm(conv)
    np.testing.assert_allclose(folded, conv2.weight.detach().numpy(), atol=1e-6)


def _synthetic_dit_sd(in_ch, ctx_dim, hidden, depth, max_len, freq=256):
    """Torch-layout state dict with the reference's parameter names/shapes
    (concatDiT.py:238-304 module tree)."""
    shapes = {
        "t_embedder.mlp.0.weight": (hidden, freq),
        "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden),
        "t_embedder.mlp.2.bias": (hidden,),
        "t_embedder.proj_w.weight": (freq, freq),
        "proj_in.weight": (hidden, in_ch, 5),
        "proj_in.bias": (hidden,),
        "pos_emb.weight": (max_len, hidden),
        "final_layer.norm_final.weight": (hidden,),
        "final_layer.norm_final.bias": (hidden,),
        "final_layer.conv1d.weight": (in_ch, hidden, 1),
        "final_layer.conv1d.bias": (in_ch,),
    }
    for c in ("c1_embedder", "c2_embedder"):
        shapes.update({
            f"{c}.mlp.0.weight": (hidden, ctx_dim),
            f"{c}.mlp.0.bias": (hidden,),
            f"{c}.mlp.2.weight": (hidden, hidden),
            f"{c}.mlp.2.bias": (hidden,),
            f"{c}.mlp.3.weight": (hidden,),
            f"{c}.mlp.3.bias": (hidden,),
        })
    for i in range(depth):
        b = f"blocks.{i}"
        shapes.update({
            f"{b}.norm.weight": (hidden,),
            f"{b}.norm.bias": (hidden,),
            f"{b}.proj_in.weight": (hidden, hidden, 1),
            f"{b}.proj_in.bias": (hidden,),
            f"{b}.proj_out.weight": (hidden, hidden, 1),
            f"{b}.proj_out.bias": (hidden,),
        })
        t = f"{b}.transformer_blocks.0"
        for a in ("attn1", "attn2"):
            shapes.update({
                f"{t}.{a}.to_q.weight": (hidden, hidden),
                f"{t}.{a}.to_k.weight": (hidden, hidden),
                f"{t}.{a}.to_v.weight": (hidden, hidden),
                f"{t}.{a}.to_out.0.weight": (hidden, hidden),
                f"{t}.{a}.to_out.0.bias": (hidden,),
            })
        inner = 4 * hidden
        shapes.update({
            f"{t}.ff.net.0.proj.weight": (2 * inner, hidden, 9),
            f"{t}.ff.net.0.proj.bias": (2 * inner,),
            f"{t}.ff.net.2.weight": (hidden, inner, 9),
            f"{t}.ff.net.2.bias": (hidden,),
            f"{t}.norm1.weight": (hidden,),
            f"{t}.norm1.bias": (hidden,),
            f"{t}.norm2.weight": (hidden,),
            f"{t}.norm2.bias": (hidden,),
            f"{t}.norm3.weight": (hidden,),
            f"{t}.norm3.bias": (hidden,),
        })
    return _torch_layout_from_spec(shapes)


def test_convert_dit_structure():
    in_ch, ctx, hidden, depth, max_len = 4, 16, 32, 2, 64
    model = ConcatDiT2MLP(
        in_channels=in_ch, context_dim=ctx, hidden_size=hidden, depth=depth,
        num_heads=4, max_len=max_len,
    )
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, in_ch)), jnp.zeros((1,)), jnp.zeros((1, 6, ctx)),
        jnp.zeros((1, 256)),
    )["params"]
    sd = _synthetic_dit_sd(in_ch, ctx, hidden, depth, max_len)
    converted = convert_dit(sd, depth=depth)
    assert _tree_spec(converted) == _tree_spec(init)
    # converted params must run
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        jnp.zeros((1, 8, in_ch)), jnp.zeros((1,)), jnp.zeros((1, 6, ctx)),
        jnp.zeros((1, 256)),
    )
    assert out.shape == (1, 8, in_ch)


def _synthetic_vae_sd(cfg: VAEConfig):
    shapes = {}
    k = cfg.kernel_size

    def res(prefix, cin, cout, kernel):
        shapes.update({
            f"{prefix}.norm1.weight": (cin,), f"{prefix}.norm1.bias": (cin,),
            f"{prefix}.conv1.weight": (cout, cin, kernel), f"{prefix}.conv1.bias": (cout,),
            f"{prefix}.norm2.weight": (cout,), f"{prefix}.norm2.bias": (cout,),
            f"{prefix}.conv2.weight": (cout, cout, kernel), f"{prefix}.conv2.bias": (cout,),
        })
        if cin != cout:
            shapes.update({
                f"{prefix}.nin_shortcut.weight": (cout, cin, 1),
                f"{prefix}.nin_shortcut.bias": (cout,),
            })

    def attn(prefix, c):
        shapes.update({f"{prefix}.norm.weight": (c,), f"{prefix}.norm.bias": (c,)})
        for n in ("q", "k", "v", "proj_out"):
            shapes.update({f"{prefix}.{n}.weight": (c, c, 1), f"{prefix}.{n}.bias": (c,)})

    ch = cfg.ch
    shapes.update({
        "encoder.conv_in.weight": (ch, cfg.in_channels, k), "encoder.conv_in.bias": (ch,),
    })
    block_in = ch
    for i, mult in enumerate(cfg.ch_mult):
        block_out = ch * mult
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", block_in, block_out, k)
            block_in = block_out
        if i in cfg.down_layers:
            shapes.update({
                f"encoder.down.{i}.downsample.conv.weight": (block_in, block_in, 3),
                f"encoder.down.{i}.downsample.conv.bias": (block_in,),
            })
    res("encoder.mid.block_1", block_in, block_in, k)
    attn("encoder.mid.attn_1", block_in)
    res("encoder.mid.block_2", block_in, block_in, k)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    shapes.update({
        "encoder.norm_out.weight": (block_in,), "encoder.norm_out.bias": (block_in,),
        "encoder.conv_out.weight": (zc, block_in, k), "encoder.conv_out.bias": (zc,),
        "quant_conv.weight": (2 * cfg.embed_dim, zc, 1), "quant_conv.bias": (2 * cfg.embed_dim,),
        "post_quant_conv.weight": (cfg.z_channels, cfg.embed_dim, 1),
        "post_quant_conv.bias": (cfg.z_channels,),
    })
    block_in = ch * cfg.ch_mult[-1]
    shapes.update({
        "decoder.conv_in.weight": (block_in, cfg.z_channels, k),
        "decoder.conv_in.bias": (block_in,),
    })
    res("decoder.mid.block_1", block_in, block_in, 3)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in, 3)
    up_layers = [i + 1 for i in cfg.down_layers]
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", block_in, block_out, 3)
            block_in = block_out
        if i in up_layers:
            shapes.update({
                f"decoder.up.{i}.upsample.conv.weight": (block_in, block_in, 3),
                f"decoder.up.{i}.upsample.conv.bias": (block_in,),
            })
    shapes.update({
        "decoder.norm_out.weight": (block_in,), "decoder.norm_out.bias": (block_in,),
        "decoder.conv_out.weight": (cfg.out_ch, block_in, k),
        "decoder.conv_out.bias": (cfg.out_ch,),
    })
    return _torch_layout_from_spec(shapes)


def test_convert_vae_structure():
    cfg = VAEConfig(
        in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        down_layers=(0,), attn_layers=(), kernel_size=5, z_channels=4, embed_dim=4,
    )
    model = AutoencoderKL1D(cfg)
    rng = jax.random.PRNGKey(0)
    init = model.init(rng, jnp.zeros((1, 8, 8)), rng)["params"]
    converted = convert_vae(
        _synthetic_vae_sd(cfg), num_levels=2, num_res_blocks=1,
        down_layers=(0,), attn_layers=(),
    )
    assert _tree_spec(converted) == _tree_spec(init)
    moments = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        jnp.zeros((1, 8, 8)), method=AutoencoderKL1D.encode_moments,
    )
    assert moments.shape == (1, 4, 8)


def _synthetic_bigvgan_sd(cfg: BigVGANConfig):
    shapes = {}

    def wn_conv(prefix, cout, cin, k):
        shapes.update({
            f"{prefix}.weight_g": (cout, 1, 1),
            f"{prefix}.weight_v": (cout, cin, k),
            f"{prefix}.bias": (cout,),
        })

    def wn_convT(prefix, cin, cout, k):
        shapes.update({
            f"{prefix}.weight_g": (cin, 1, 1),
            f"{prefix}.weight_v": (cin, cout, k),
            f"{prefix}.bias": (cout,),
        })

    c0 = cfg.upsample_initial_channel
    wn_conv("conv_pre", c0, cfg.num_mels, 7)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = c0 // (2**i), c0 // (2 ** (i + 1))
        wn_convT(f"ups.{i}.0", cin, cout, k)
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            r = f"resblocks.{i * len(cfg.resblock_kernel_sizes) + j}"
            for m in range(len(rd)):
                wn_conv(f"{r}.convs1.{m}", cout, cout, rk)
                wn_conv(f"{r}.convs2.{m}", cout, cout, rk)
                shapes.update({
                    f"{r}.activations.{2 * m}.act.alpha": (cout,),
                    f"{r}.activations.{2 * m}.act.beta": (cout,),
                    f"{r}.activations.{2 * m + 1}.act.alpha": (cout,),
                    f"{r}.activations.{2 * m + 1}.act.beta": (cout,),
                })
    ch = c0 // (2 ** len(cfg.upsample_rates))
    shapes.update({"activation_post.act.alpha": (ch,), "activation_post.act.beta": (ch,)})
    wn_conv("conv_post", 1, ch, 7)
    return _torch_layout_from_spec(shapes)


def test_convert_bigvgan_structure():
    cfg = BigVGANConfig(
        num_mels=8,
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    model = BigVGAN(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)))["params"]
    converted = convert_bigvgan(
        _synthetic_bigvgan_sd(cfg), num_upsamples=2, num_kernels=2, dilations_per_block=2,
    )
    assert _tree_spec(converted) == _tree_spec(init)
    wav = model.apply({"params": jax.tree.map(jnp.asarray, converted)}, jnp.zeros((1, 8, 8)))
    assert wav.shape == (1, 64)
