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
