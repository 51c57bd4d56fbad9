"""PatchGAN discriminator for VAE training.

Behavior parity: `ldm/modules/discriminator/model.py:98-147`
(NLayerDiscriminator, Pix2Pix): Conv2d k4 s2 p1 + LeakyReLU(0.2), then
(n_layers-1) x [Conv2d s2 + BatchNorm + LeakyReLU], one s1 block, and a
1-channel head. Used on mel "images" (B, 1, 80, T) with input_nc=1,
ndf=64, n_layers=3 (configs/autoencoder1d.yaml:24-35).

Channels-last (B, H, W, C); BatchNorm carries batch_stats state like
torch's running stats.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_init = nn.initializers.normal(0.02)


class ActNorm(nn.Module):
    """Per-channel affine norm with data-dependent init
    (`ldm/modules/discriminator/model.py:5-87`).

    TPU-first: the reference initializes loc/scale from the first training
    batch inside forward (mutation under autograd). Here init happens once,
    explicitly, via `actnorm_init_variables`; the jitted forward is pure.
    Channels-last (..., C).
    """

    num_features: int
    logdet: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, reverse: bool = False):
        loc = self.param("loc", nn.initializers.zeros, (self.num_features,))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        if reverse:
            return x / scale - loc
        h = scale * (x + loc)
        if self.logdet:
            # height*width * sum log|scale| (model.py:57-61)
            hw = 1
            for d in x.shape[1:-1]:
                hw *= d
            logdet = hw * jnp.sum(jnp.log(jnp.abs(scale)))
            return h, logdet * jnp.ones(x.shape[0], x.dtype)
        return h


def actnorm_init_variables(x: jnp.ndarray):
    """Data-dependent ActNorm init (model.py:17-36): loc=-mean, scale=1/std
    per channel over all other dims. Returns {'loc','scale'} arrays."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    std = jnp.std(x, axis=axes, ddof=1)
    return {"loc": -mean, "scale": 1.0 / (std + 1e-6)}


class NLayerDiscriminator2D(nn.Module):
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, H, W, C) -> patch logits (B, H', W', 1)."""
        lrelu = lambda h: nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    kernel_init=_init, name="conv_0")(x)
        h = lrelu(h)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=_init, name=f"conv_{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn_{n}")(h)
            h = lrelu(h)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_init, name=f"conv_{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name=f"bn_{self.n_layers}")(h)
        h = lrelu(h)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
                       kernel_init=_init, name="conv_out")(h)


class NLayerDiscriminator1dFeats(nn.Module):
    """1D PatchGAN over feature sequences
    (`ldm/modules/discriminator/model.py:149-202`): channel counts DECREASE
    from input_nc (e.g. 2048-d CLAP/VAE features) toward 8, kernel 4.

    Channels-last input (B, L, C_in).
    """

    input_nc: int
    ndf: int = 64  # unused by the reference too (hard-codes 64); kept for API
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(h.shape[-1], name=name)(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(h)

        use_bias = self.use_actnorm
        h = nn.Conv(self.input_nc // 2, (4,), strides=(2,), padding=[(1, 1)],
                    kernel_init=_init, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = self.input_nc // 2
        n = 1
        for n in range(1, self.n_layers):
            nf = max(nf // (2**n), 8)
            h = nn.Conv(nf, (4,), strides=(2,), padding=[(1, 1)],
                        use_bias=use_bias, kernel_init=_init,
                        name=f"conv_{n}")(h)
            h = norm(h, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)
        for j in range(2):  # two stride-1 tails (model.py:186-199)
            nf = max(nf // (2**n), 8)
            h = nn.Conv(nf, (4,), strides=(1,), padding=[(1, 1)],
                        use_bias=use_bias, kernel_init=_init,
                        name=f"conv_tail_{j}")(h)
            h = norm(h, f"norm_tail_{j}")
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4,), strides=(1,), padding=[(1, 1)],
                       kernel_init=_init, name="conv_out")(h)


class NLayerDiscriminator1dSpecs(nn.Module):
    """1D PatchGAN over spectrograms, mel bins as channels
    (`ldm/modules/discriminator/model.py:205-259`). Channels-last (B, T, 80).
    """

    input_nc: int = 80
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(h.shape[-1], name=name)(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(h)

        use_bias = self.use_actnorm
        h = nn.Conv(self.ndf, (4,), strides=(2,), padding=[(1, 1)],
                    kernel_init=_init, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers):
            nf = self.ndf * min(2**n, 8)
            h = nn.Conv(nf, (4,), strides=(2,), padding=[(1, 1)],
                        use_bias=use_bias, kernel_init=_init,
                        name=f"conv_{n}")(h)
            h = norm(h, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)
        nf = self.ndf * min(2**self.n_layers, 8)
        h = nn.Conv(nf, (4,), strides=(1,), padding=[(1, 1)],
                    use_bias=use_bias, kernel_init=_init,
                    name=f"conv_{self.n_layers}")(h)
        h = norm(h, f"norm_{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4,), strides=(1,), padding=[(1, 1)],
                       kernel_init=_init, name="conv_out")(h)
