"""ConcatDiT denoiser backbones (the "U-Net" slot of the latent diffusion).

Behavior parity: `ldm/modules/diffusionmodules/concatDiT.py:238-304`
(ConcatDiT2MLP, the live backbone of configs/audiolcm.yaml) and `:173-236`
(ConcatDiT, single condition embedder). Architecture:

  seq = [timestep token | CLAP-half cond tokens | T5-half cond tokens | latent frames]
  + learned absolute position embedding, then `depth` transformer blocks of
  (GroupNorm -> 1x1 in -> [self-attn, self-attn, conv-GEGLU-FF] -> 1x1 out
  (zero-init) -> residual), slice off the condition prefix, GroupNorm(16) +
  1x1 conv head.

Text conditions by sequence concat, NOT cross-attention (the reference's
"crossattn" conditioning_key is a misnomer; both attentions are self-attns
over the concatenated sequence, `concatDiT.py:106-125`).

TPU-first notes: everything is (B, T, C) channels-last; the latent length T
is static per duration bucket so each bucket compiles one fused graph. The
per-block residual pipeline is rematerialized with jax.checkpoint during
training (mirrors `concatDiT.py:117-118`) and left unrematerialized for
inference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiolcm_tpu.nn.attention import MultiHeadSelfAttention
from audiolcm_tpu.nn.convff import Conv1dGEGLUFeedForward
from audiolcm_tpu.nn.embeddings import timestep_embedding

_xavier = nn.initializers.xavier_uniform()


class TimestepEmbedder(nn.Module):
    """`concatDiT.py:34-74`: sinusoidal(256) (+ proj_w(w_cond)) -> MLP(hidden)."""

    hidden_size: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray, w_cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        t_freq = timestep_embedding(t, self.freq_dim)
        if w_cond is not None:
            t_freq = t_freq + nn.Dense(
                self.freq_dim, use_bias=False, kernel_init=_xavier, name="proj_w"
            )(w_cond)
        h = nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.normal(0.02), name="mlp_0"
        )(t_freq)
        h = nn.silu(h)
        return nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.normal(0.02), name="mlp_2"
        )(h)


class ConditionEmbedder(nn.Module):
    """`concatDiT.py:91-102`: Dense -> tanh-GELU -> Dense -> LayerNorm."""

    hidden_size: int

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, kernel_init=_xavier, name="mlp_0")(c)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden_size, kernel_init=_xavier, name="mlp_2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="mlp_3")(h)


class BasicTransformerBlock(nn.Module):
    """`concatDiT.py:106-125`: two self-attns + conv-GEGLU FF, pre-LN residuals."""

    dim: int
    num_heads: int
    use_flash: bool = False
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.dim // self.num_heads
        x = x + MultiHeadSelfAttention(
            self.num_heads, head_dim, self.use_flash, self.fuse_qkv, name="attn1"
        )(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + MultiHeadSelfAttention(
            self.num_heads, head_dim, self.use_flash, self.fuse_qkv, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        x = x + Conv1dGEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x


class TemporalTransformer(nn.Module):
    """`concatDiT.py:127-171`: GroupNorm -> 1x1 -> blocks -> zero-init 1x1 -> +x."""

    dim: int
    num_heads: int
    inner_depth: int = 1
    remat: bool = False
    use_flash: bool = False
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_in = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = nn.Dense(self.dim, kernel_init=_xavier, name="proj_in")(h)
        for i in range(self.inner_depth):
            block = BasicTransformerBlock
            if self.remat:
                block = nn.remat(block)
            h = block(self.dim, self.num_heads, self.use_flash, self.fuse_qkv,
                      name=f"block_{i}")(h)
        h = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
        )(h)
        return h + x_in


class ConcatDiT2MLP(nn.Module):
    """Live backbone: dual condition embedders over the CLAP/T5 halves.

    Config (configs/audiolcm.yaml:39-47): in_channels=20, context_dim=1024,
    hidden_size=576, num_heads=8, depth=4, max_len=1000.
    """

    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 576
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1000
    remat: bool = False
    use_flash: bool = False
    # serving knob: Q/K/V as one matmul (numerics-preserving; params via
    # nn.attention.fuse_attention_params)
    fuse_qkv: bool = False
    # reference hard-codes out = in (concatDiT.py:253); overridable here so
    # the hybrid inpaint variant (x concat c_concat in, eps over z out) works
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        w_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, T, in_ch) latent; t: (B,); context: (B, 2*Lc, context_dim).

        Returns eps prediction (B, T, out_ch or in_ch).
        """
        t_tok = TimestepEmbedder(self.hidden_size, name="t_embedder")(t, w_cond)[:, None, :]
        c1, c2 = jnp.split(context, 2, axis=1)
        c1 = ConditionEmbedder(self.hidden_size, name="c1_embedder")(c1)
        c2 = ConditionEmbedder(self.hidden_size, name="c2_embedder")(c2)
        cond = jnp.concatenate([c1, c2], axis=1)
        extra_len = cond.shape[1] + 1

        h = nn.Conv(
            self.hidden_size,
            kernel_size=(5,),
            padding=[(2, 2)],
            kernel_init=_xavier,
            name="proj_in",
        )(x)
        # the timestep token's sinusoid math is f32; concatenating it as-is
        # would PROMOTE the whole sequence (and every matmul after it) to f32
        # — measured 8x MXU slowdown on the FF convs in the bf16 serving
        # config. Cast the two small embedder outputs to the latent stream's
        # dtype instead (f32 training is a no-op).
        t_tok = t_tok.astype(h.dtype)
        cond = cond.astype(h.dtype)
        h = jnp.concatenate([t_tok, cond, h], axis=1)

        seq_len = h.shape[1]
        pos = self.param(
            "pos_emb", nn.initializers.xavier_normal(), (self.max_len, self.hidden_size)
        )
        h = h + pos[None, :seq_len, :]

        for i in range(self.depth):
            h = TemporalTransformer(
                self.hidden_size, self.num_heads, remat=self.remat,
                use_flash=self.use_flash, fuse_qkv=self.fuse_qkv,
                name=f"blocks_{i}"
            )(h)

        h = h[:, extra_len:, :]
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="final_norm")(h)
        out_ch = self.out_channels or self.in_channels
        return nn.Dense(out_ch, kernel_init=_xavier, name="final_conv")(h)


class ConcatDiT(nn.Module):
    """Single-condition-embedder variant (`concatDiT.py:173-236`, parity-extra)."""

    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 576
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1000
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        w_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        t_tok = TimestepEmbedder(self.hidden_size, name="t_embedder")(t, w_cond)[:, None, :]
        cond = ConditionEmbedder(self.hidden_size, name="c_embedder")(context)
        extra_len = cond.shape[1] + 1
        h = nn.Conv(
            self.hidden_size,
            kernel_size=(5,),
            padding=[(2, 2)],
            kernel_init=_xavier,
            name="proj_in",
        )(x)
        # cast the f32 timestep token to the stream dtype before concat (see
        # ConcatDiT2MLP: unchecked, it promotes the whole backbone to f32)
        h = jnp.concatenate([t_tok.astype(h.dtype), cond.astype(h.dtype), h], axis=1)
        seq_len = h.shape[1]
        pos = self.param(
            "pos_emb", nn.initializers.xavier_normal(), (self.max_len, self.hidden_size)
        )
        h = h + pos[None, :seq_len, :]
        for i in range(self.depth):
            h = TemporalTransformer(
                self.hidden_size, self.num_heads, remat=self.remat, name=f"blocks_{i}"
            )(h)
        h = h[:, extra_len:, :]
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="final_norm")(h)
        return nn.Dense(self.in_channels, kernel_init=_xavier, name="final_conv")(h)
