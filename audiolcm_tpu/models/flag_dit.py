"""TxtFlagLargeDiT — LLaMA-style DiT backbone (parity-extra).

Behavior parity: `ldm/modules/diffusionmodules/flag_large_dit.py:527-654`:
  * tokens = linear proj of latent frames; rotary position embeddings
    (precomputed freqs for head_dim over max_len)
  * blocks: RMSNorm -> self-attention (optional grouped KV heads) with a
    tanh-GATED cross-attention branch over caption tokens (wk_y/wv_y,
    per-head zero-init gate), RMSNorm -> SwiGLU feed-forward
    (2/3*4d rounded to multiple_of)
  * adaLN: 6-way (shift/scale/gate x attn/mlp) modulation driven by
    t_embedding + pooled-caption embedding; zero-init so blocks start as
    identity; FinalLayer = non-affine LN + 2-way adaLN + linear
All attention masks in the reference call path are all-ones
(`flag_large_dit.py:592-596`), so no masking here.

Channels-last (B, T, C); rotary applied in f32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiolcm_tpu.models.t5_encoder import RMSNorm
from audiolcm_tpu.nn.embeddings import timestep_embedding

_xavier = nn.initializers.xavier_uniform()


def precompute_rotary(head_dim: int, max_len: int, theta: float = 10000.0):
    """(max_len, head_dim//2) cos/sin tables (LLaMA freqs_cis)."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    t = np.arange(max_len)
    angles = np.outer(t, freqs)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D). Rotate consecutive pairs (LLaMA convention)."""
    t = x.shape[1]
    x = x.astype(jnp.float32)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = cos[None, :t, None, :]
    sin = sin[None, :t, None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class FlagAttention(nn.Module):
    dim: int
    num_heads: int
    n_kv_heads: Optional[int] = None
    y_dim: int = 0
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.num_heads
        kvh = self.n_kv_heads or h
        hd = self.dim // h
        b, t, _ = x.shape

        dense = lambda feats, name: nn.Dense(feats, use_bias=False,
                                             kernel_init=_xavier, name=name)
        q = dense(h * hd, "wq")(x)
        k = dense(kvh * hd, "wk")(x)
        v = dense(kvh * hd, "wv")(x)
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-5, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-5, name="k_norm")(k)
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, kvh, hd)
        v = v.reshape(b, t, kvh, hd)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        if kvh != h:
            rep = h // kvh
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        bhtd = lambda a: a.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", bhtd(q), bhtd(k),
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, bhtd(v.astype(jnp.float32)))

        if self.y_dim > 0 and y is not None:
            yk = dense(kvh * hd, "wk_y")(y)
            if self.qk_norm:
                yk = nn.LayerNorm(epsilon=1e-5, name="ky_norm")(yk)
            yv = dense(kvh * hd, "wv_y")(y)
            ly = y.shape[1]
            yk = yk.reshape(b, ly, kvh, hd)
            yv = yv.reshape(b, ly, kvh, hd)
            if kvh != h:
                rep = h // kvh
                yk = jnp.repeat(yk, rep, axis=2)
                yv = jnp.repeat(yv, rep, axis=2)
            ylogits = jnp.einsum("bhqd,bhkd->bhqk", bhtd(q), bhtd(yk.astype(jnp.float32)),
                                 preferred_element_type=jnp.float32) * (hd**-0.5)
            yweights = nn.softmax(ylogits, axis=-1)
            yout = jnp.einsum("bhqk,bhkd->bhqd", yweights, bhtd(yv.astype(jnp.float32)))
            gate = self.param("gate", nn.initializers.zeros, (h,))
            out = out + jnp.tanh(gate)[None, :, None, None] * yout

        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd).astype(x.dtype)
        return dense(self.dim, "wo")(out)


class SwiGLUFeedForward(nn.Module):
    dim: int
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(2 * (4 * self.dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        hidden = self.multiple_of * (-(-hidden // self.multiple_of))
        dense = lambda f, n: nn.Dense(f, use_bias=False, kernel_init=_xavier, name=n)
        return dense(self.dim, "w2")(nn.silu(dense(hidden, "w1")(x)) * dense(hidden, "w3")(x))


class FlagDiTBlock(nn.Module):
    dim: int
    num_heads: int
    n_kv_heads: Optional[int]
    multiple_of: int
    ffn_dim_multiplier: Optional[float]
    norm_eps: float
    qk_norm: bool
    y_dim: int

    @nn.compact
    def __call__(self, x, cos, sin, y, adaln) -> jnp.ndarray:
        mod = nn.Dense(6 * self.dim, kernel_init=nn.initializers.zeros,
                       name="adaLN_modulation")(nn.silu(adaln))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
        y_n = RMSNorm(self.norm_eps, name="attention_y_norm")(y)
        h = x + g_msa[:, None, :] * FlagAttention(
            self.dim, self.num_heads, self.n_kv_heads, self.y_dim, self.qk_norm,
            name="attention",
        )(modulate(RMSNorm(self.norm_eps, name="attention_norm")(x), s_msa, sc_msa),
          cos, sin, y_n)
        return h + g_mlp[:, None, :] * SwiGLUFeedForward(
            self.dim, self.multiple_of, self.ffn_dim_multiplier, name="feed_forward"
        )(modulate(RMSNorm(self.norm_eps, name="ffn_norm")(h), s_mlp, sc_mlp))


class TxtFlagLargeDiT(nn.Module):
    """x: (B, T, in_ch), t: (B,), context: (B, Lc, context_dim) -> eps."""

    in_channels: int = 20
    context_dim: int = 1024
    hidden_size: int = 576
    depth: int = 4
    num_heads: int = 8
    max_len: int = 1000
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, t, context, w_cond=None) -> jnp.ndarray:
        b = x.shape[0]
        h = nn.Dense(self.hidden_size, kernel_init=_xavier, name="proj_in")(x)

        t_freq = timestep_embedding(t, 256)
        t_emb = nn.Dense(self.hidden_size, kernel_init=nn.initializers.normal(0.02),
                         name="t_mlp_0")(t_freq)
        t_emb = nn.Dense(self.hidden_size, kernel_init=nn.initializers.normal(0.02),
                         name="t_mlp_2")(nn.silu(t_emb))

        cap_pool = jnp.mean(context, axis=1)
        cap = nn.LayerNorm(epsilon=1e-5, name="cap_norm")(cap_pool)
        cap = nn.Dense(self.hidden_size, kernel_init=_xavier, name="cap_proj")(cap)
        # keep the f32 sinusoid out of the modulation path: an f32 adaln
        # promotes every gated residual (and so the whole backbone) to f32
        # in the bf16 serving config (see dit.py)
        adaln = (t_emb + cap).astype(h.dtype)

        cos_np, sin_np = precompute_rotary(self.hidden_size // self.num_heads, self.max_len)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        for i in range(self.depth):
            h = FlagDiTBlock(
                self.hidden_size, self.num_heads, self.n_kv_heads, self.multiple_of,
                self.ffn_dim_multiplier, self.norm_eps, self.qk_norm, self.context_dim,
                name=f"blocks_{i}",
            )(h, cos, sin, context, adaln)

        mod = nn.Dense(2 * self.hidden_size, kernel_init=nn.initializers.zeros,
                       name="final_adaLN")(nn.silu(adaln))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         name="final_norm")(h)
        h = modulate(h, shift, scale)
        return nn.Dense(self.in_channels, kernel_init=nn.initializers.zeros,
                        name="final_linear")(h)
