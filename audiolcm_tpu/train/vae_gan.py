"""VAE GAN training: generator/discriminator alternating steps.

Behavior parity: `ldm/models/autoencoder1d.py:79-150` +
`ldm/modules/losses_audio/contperceptual.py` with
configs/autoencoder1d.yaml:24-35:
  * generator loss: L1 rec (logvar fixed at 0 — the reference's loss.logvar
    parameter is in NEITHER optimizer, so it never moves) + 1e-6 * KL +
    adaptive_d_weight * disc_factor * (-mean D(rec)); disc_factor = 2 after
    step 80001, else 0
  * adaptive d_weight = ||d nll/d w_last|| / (||d g/d w_last|| + 1e-4),
    clipped to [0, 1e4], * disc_weight 0.5 (contperceptual.py:61-72)
  * discriminator: MSE (LSGAN) loss 0.5*(mean (1-D(x))^2 + mean D(x̂)^2) +
    R1 gradient penalty weight 3 on real inputs
  * two Adam(lr, betas=(0.5, 0.9)) optimizers, alternating

TPU-first: both sub-steps are jitted; R1's grad-of-grad and the adaptive
weight's two extra backward passes are expressed with jax.grad composition
(no retain_graph bookkeeping). Data-parallel via the standard mesh: batch
sharded, psum'd grads come from XLA automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class VAEGANConfig:
    disc_start: int = 80001
    kl_weight: float = 1.0e-6
    disc_weight: float = 0.5
    disc_factor: float = 2.0
    r1_weight: float = 3.0
    learning_rate: float = 4.5e-6  # base_lr; scaled by accum*ngpu*bs upstream
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    disc_loss: str = "mse"  # 'mse' | 'hinge' | 'vanilla'


class VAEGANState(NamedTuple):
    step: jnp.ndarray
    ae_params: Any
    disc_params: Any
    disc_batch_stats: Any
    ae_opt: Any
    disc_opt: Any


def make_optimizers(cfg: VAEGANConfig):
    mk = lambda: optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    return mk(), mk()


def adopt_weight(factor: float, step: jnp.ndarray, threshold: int) -> jnp.ndarray:
    return jnp.where(step < threshold, 0.0, factor)


def disc_loss_fn(kind: str, logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    """vqperceptual.py hinge/vanilla + contperceptual.py:9-20 mse variants."""
    if kind == "mse":
        return 0.5 * (jnp.mean((1.0 - logits_real) ** 2) + jnp.mean(logits_fake**2))
    if kind == "hinge":
        return 0.5 * (
            jnp.mean(jax.nn.relu(1.0 - logits_real))
            + jnp.mean(jax.nn.relu(1.0 + logits_fake))
        )
    if kind == "vanilla":
        return 0.5 * (
            jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
        )
    raise ValueError(kind)


def make_vae_gan_steps(
    vae_apply: Callable,  # (params, mel, rng) -> (recon, posterior)
    disc_apply: Callable,  # (params, batch_stats, x, train) -> (logits, new_stats)
    cfg: VAEGANConfig,
    last_layer_path: Tuple[str, ...] = ("decoder", "conv_out", "kernel"),
):
    """Returns (gen_step, disc_step), each jittable.

    mel batches are (B, T, 80) channels-last; the discriminator sees them as
    (B, 80, T, 1) "images" like the reference's unsqueeze(1).
    """
    ae_opt, d_opt = make_optimizers(cfg)

    def get_last(params):
        node = params
        for k in last_layer_path:
            node = node[k]
        return node

    def set_last(params, value):
        flat = flax.traverse_util.flatten_dict(params)
        flat[last_layer_path] = value
        return flax.traverse_util.unflatten_dict(flat)

    def to_disc_input(mel_btc: jnp.ndarray) -> jnp.ndarray:
        return jnp.transpose(mel_btc, (0, 2, 1))[..., None]  # (B, 80, T, 1)

    def recon_losses(ae_params, mel, rng):
        recon, posterior = vae_apply(ae_params, mel, rng)
        rec_l1 = jnp.abs(mel - recon)
        # logvar == 0 (see module docstring) -> nll == rec; sum/batch like
        # contperceptual.py:84-90
        nll = jnp.sum(rec_l1) / mel.shape[0]
        kl = jnp.sum(posterior.kl()) / mel.shape[0]
        return recon, nll, kl

    def gen_step(state: VAEGANState, mel: jnp.ndarray, rng: jax.Array):
        def nll_of_last(last, ae_params, mel, rng):
            _, nll, _ = recon_losses(set_last(ae_params, last), mel, rng)
            return nll

        def g_of_last(last, ae_params, mel, rng):
            recon, _, _ = recon_losses(set_last(ae_params, last), mel, rng)
            logits, _ = disc_apply(
                state.disc_params, state.disc_batch_stats, to_disc_input(recon), False
            )
            return -jnp.mean(logits)

        def total_loss(ae_params):
            recon, nll, kl = recon_losses(ae_params, mel, rng)
            logits, _ = disc_apply(
                state.disc_params, state.disc_batch_stats, to_disc_input(recon), False
            )
            g_loss = -jnp.mean(logits)

            last = get_last(ae_params)
            nll_g = jax.grad(nll_of_last)(last, ae_params, mel, rng)
            g_g = jax.grad(g_of_last)(last, ae_params, mel, rng)
            d_weight = jnp.linalg.norm(nll_g.ravel()) / (jnp.linalg.norm(g_g.ravel()) + 1e-4)
            d_weight = jax.lax.stop_gradient(
                jnp.clip(d_weight, 0.0, 1e4) * cfg.disc_weight
            )
            factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)
            loss = nll + cfg.kl_weight * kl + d_weight * factor * g_loss
            aux = {
                "train/nll_loss": nll,
                "train/kl_loss": kl,
                "train/g_loss": g_loss,
                "train/d_weight": d_weight,
                "train/total_loss": loss,
            }
            return loss, aux

        (loss, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.ae_params
        )
        updates, ae_opt_state = ae_opt.update(grads, state.ae_opt, state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, updates)
        return state._replace(ae_params=ae_params, ae_opt=ae_opt_state), metrics

    def disc_step(state: VAEGANState, mel: jnp.ndarray, rng: jax.Array):
        recon, _, _ = recon_losses(state.ae_params, mel, rng)
        recon = jax.lax.stop_gradient(recon)
        real = to_disc_input(mel)
        fake = to_disc_input(recon)

        def loss_fn(disc_params):
            def real_logits_sum(x):
                logits, _ = disc_apply(disc_params, state.disc_batch_stats, x, True)
                return jnp.sum(logits), logits

            (_, logits_real), r1_grads = jax.value_and_grad(
                real_logits_sum, has_aux=True
            )(real)
            logits_fake, new_stats = disc_apply(
                disc_params, state.disc_batch_stats, fake, True
            )
            factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)
            d_loss = factor * disc_loss_fn(cfg.disc_loss, logits_real, logits_fake)
            r1 = jnp.mean(r1_grads**2)
            d_loss = d_loss + cfg.r1_weight * r1
            aux = {
                "train/disc_loss": d_loss,
                "train/logits_real": jnp.mean(logits_real),
                "train/logits_fake": jnp.mean(logits_fake),
                "train/r1_penalty": r1,
                "_new_stats": new_stats,
            }
            return d_loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.disc_params)
        new_stats = aux.pop("_new_stats")
        updates, d_opt_state = d_opt.update(grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        new_state = state._replace(
            step=state.step + 1,
            disc_params=disc_params,
            disc_batch_stats=new_stats,
            disc_opt=d_opt_state,
        )
        return new_state, aux

    return gen_step, disc_step


def init_vae_gan_state(ae_params, disc_params, disc_batch_stats, cfg: VAEGANConfig):
    ae_opt, d_opt = make_optimizers(cfg)
    return VAEGANState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params,
        disc_params=disc_params,
        disc_batch_stats=disc_batch_stats,
        ae_opt=ae_opt.init(ae_params),
        disc_opt=d_opt.init(disc_params),
    )
