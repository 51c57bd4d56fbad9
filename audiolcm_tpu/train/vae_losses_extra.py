"""VAE GAN loss variants beyond the shipped `contperceptual.py` loss.

Behavior parity with the reference's alternative first-stage losses
(none are wired into a shipped config; they are selectable through the
same `lossconfig.target` schema):

  * `multiw`  — `ldm/modules/losses_audio/contperceptual_multiw.py`:
    MultiWindowDiscriminator only ('bn', reduction='stack'), hinge/vanilla,
    optional LPAPS perceptual term.
  * `dis`     — `contperceptual_dis.py`: PatchGAN + MultiWindowDiscriminator
    ('in', reduction='stack') with separate adaptive weights per tower and
    summed discriminator losses (:60-137).
  * `mask`    — `contperceptual_mask.py`: pad-aware variant; x_len derived
    from frames whose (C,F)-mean exceeds pad_value, reconstructions blended
    back to pad_value outside the mask before the discriminator sees them.
  * `vq`      — `losses_audio/vqperceptual.py:19-135` VQLPAPSWithDiscriminator
    for the VQModel first stage: mean-L1 nll + codebook term, no KL.

All variants share the reference's adaptive d_weight
(grad-norm ratio at the decoder's last layer, clipped to [0, 1e4]) and
`adopt_weight` warm-up gating. TPU-first: each step is a pure jittable
function over explicit (params, opt_state) pytrees; the reference's
`retain_graph` double-backward is jax.grad composition; the multi-window
random clip uses a threaded rng, so one compiled step serves all steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from audiolcm_tpu.train.vae_gan import adopt_weight, disc_loss_fn


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    variant: str = "multiw"  # 'multiw' | 'dis' | 'mask' | 'vq'
    disc_start: int = 80001
    kl_weight: float = 1.0
    codebook_weight: float = 1.0  # vq only
    disc_weight: float = 1.0
    disc_factor: float = 1.0
    perceptual_weight: float = 0.0
    disc_loss: str = "hinge"
    pad_value: float = -1.0  # mask variant (contperceptual_mask.py:19)
    learning_rate: float = 4.5e-6
    adam_b1: float = 0.5
    adam_b2: float = 0.9


class VariantState(NamedTuple):
    step: jnp.ndarray
    ae_params: Any
    disc_params: Any  # pytree holding whichever towers the variant uses
    ae_opt: Any
    disc_opt: Any


def sequence_mask(length: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """contperceptual_mask.py:9-13: (B,) -> (B, max_length) bool."""
    return jnp.arange(max_length)[None, :] < length[:, None]


def mel_lengths_from_pad(mel_btc: jnp.ndarray, pad_value: float) -> jnp.ndarray:
    """Valid-frame count per sample: frames whose mel-bin mean > pad_value
    (contperceptual_mask.py:67-69, on (B,1,F,T) -> here (B,T,F))."""
    return jnp.sum(
        (jnp.mean(mel_btc, axis=-1) > pad_value).astype(jnp.int32), axis=-1)


def _adaptive_weight(nll_fn: Callable, g_fn: Callable, last: jnp.ndarray,
                     disc_weight: float) -> jnp.ndarray:
    nll_g = jax.grad(nll_fn)(last)
    g_g = jax.grad(g_fn)(last)
    w = jnp.linalg.norm(nll_g.ravel()) / (jnp.linalg.norm(g_g.ravel()) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4) * disc_weight)


def make_variant_gan_steps(
    vae_apply: Callable,  # (ae_params, mel_btc, rng) -> (recon, posterior)
    cfg: VariantConfig,
    patch_disc_apply: Optional[Callable] = None,  # (p, mel_bhwc) -> logits
    multi_disc_apply: Optional[Callable] = None,  # (p, mel_btc, rng) -> logits
    last_layer_get: Optional[Callable] = None,  # params -> last-layer array
    last_layer_set: Optional[Callable] = None,  # (params, arr) -> params
    perceptual_fn: Optional[Callable] = None,  # (x, y) -> (B,1,1,1) LPAPS
):
    """Returns (gen_step, disc_step) for the chosen variant.

    `disc_params` is a dict {'patch': ..., 'multi': ...} holding whichever
    towers the variant uses. mel batches are (B, T, 80) channels-last.
    """
    use_patch = cfg.variant in ("dis", "mask", "vq")
    use_multi = cfg.variant in ("multiw", "dis")
    if use_patch:
        assert patch_disc_apply is not None
    if use_multi:
        assert multi_disc_apply is not None

    ae_opt = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    d_opt = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)

    def to_patch_input(mel_btc):
        return jnp.transpose(mel_btc, (0, 2, 1))[..., None]  # (B, 80, T, 1)

    def rec_terms(ae_params, mel, rng):
        recon, posterior = vae_apply(ae_params, mel, rng)
        rec = jnp.abs(mel - recon)
        if cfg.perceptual_weight > 0 and perceptual_fn is not None:
            rec = rec + cfg.perceptual_weight * perceptual_fn(mel, recon)
        nll = jnp.sum(rec) / mel.shape[0]  # logvar fixed at 0 (see vae_gan)
        if cfg.variant == "vq":
            nll = jnp.mean(rec)  # vqperceptual.py:80
            kl = jnp.zeros(())
        else:
            kl = jnp.sum(posterior.kl()) / mel.shape[0]
        return recon, nll, kl

    def mask_recon(mel, recon):
        """mask variant: force padded frames back to pad_value
        (contperceptual_mask.py:89-90)."""
        x_len = mel_lengths_from_pad(mel, cfg.pad_value)
        m = sequence_mask(x_len, mel.shape[1])[..., None].astype(mel.dtype)
        return recon * m + (1.0 - m) * cfg.pad_value

    def gen_step(state: VariantState, mel: jnp.ndarray, rng: jax.Array,
                 codebook_loss: Optional[jnp.ndarray] = None):
        rng_vae, rng_win = jax.random.split(rng)

        def g_losses(ae_params):
            recon, nll, kl = rec_terms(ae_params, mel, rng_vae)
            if cfg.variant == "mask":
                recon = mask_recon(mel, recon)
            out = {}
            if use_patch:
                out["g"] = -jnp.mean(
                    patch_disc_apply(state.disc_params["patch"],
                                     to_patch_input(recon)))
            if use_multi:
                out["g_multi"] = -jnp.mean(
                    multi_disc_apply(state.disc_params["multi"], recon,
                                     rng_win))
            return recon, nll, kl, out

        def total_loss(ae_params):
            _, nll, kl, g = g_losses(ae_params)
            factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)
            loss = nll + cfg.kl_weight * kl
            metrics = {"train/nll_loss": nll, "train/kl_loss": kl}
            if cfg.variant == "vq" and codebook_loss is not None:
                loss = loss + cfg.codebook_weight * jnp.mean(codebook_loss)
                metrics["train/quant_loss"] = jnp.mean(codebook_loss)
            if last_layer_get is not None:
                last = last_layer_get(ae_params)
                for key, g_loss in g.items():
                    def nll_of(l):
                        _, n, _, _ = g_losses(last_layer_set(ae_params, l))
                        return n

                    def g_of(l, key=key):
                        _, _, _, gg = g_losses(last_layer_set(ae_params, l))
                        return gg[key]

                    w = _adaptive_weight(nll_of, g_of, last, cfg.disc_weight)
                    loss = loss + w * factor * g_loss
                    metrics[f"train/{key}_loss"] = g_loss
                    metrics[f"train/d_weight_{key}"] = w
            metrics["train/total_loss"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.ae_params)
        updates, ae_opt_state = ae_opt.update(grads, state.ae_opt,
                                              state.ae_params)
        ae_params = optax.apply_updates(state.ae_params, updates)
        return state._replace(ae_params=ae_params, ae_opt=ae_opt_state), metrics

    def disc_step(state: VariantState, mel: jnp.ndarray, rng: jax.Array):
        rng_vae, rng_win = jax.random.split(rng)
        recon, _, _ = rec_terms(state.ae_params, mel, rng_vae)
        recon = jax.lax.stop_gradient(recon)
        if cfg.variant == "mask":
            recon = mask_recon(mel, recon)
        factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)

        def loss_fn(disc_params):
            d_loss = jnp.zeros(())
            metrics = {}
            if use_patch:
                lr = patch_disc_apply(disc_params["patch"], to_patch_input(mel))
                lf = patch_disc_apply(disc_params["patch"],
                                      to_patch_input(recon))
                d = factor * disc_loss_fn(cfg.disc_loss, lr, lf)
                d_loss = d_loss + d
                metrics.update({"train/disc_loss": d,
                                "train/logits_real": jnp.mean(lr),
                                "train/logits_fake": jnp.mean(lf)})
            if use_multi:
                # reference reuses the same random windows for real and fake
                # within one step (start_frames_wins threading)
                lr = multi_disc_apply(disc_params["multi"], mel, rng_win)
                lf = multi_disc_apply(disc_params["multi"], recon, rng_win)
                d = factor * disc_loss_fn(cfg.disc_loss, lr, lf)
                d_loss = d_loss + d
                metrics["train/disc_loss_multi"] = d
                if not use_patch:
                    metrics.update({"train/logits_real": jnp.mean(lr),
                                    "train/logits_fake": jnp.mean(lf)})
            metrics["train/disc_loss_total"] = d_loss
            return d_loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.disc_params)
        updates, d_opt_state = d_opt.update(grads, state.disc_opt,
                                            state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(step=state.step + 1, disc_params=disc_params,
                              disc_opt=d_opt_state), metrics

    return gen_step, disc_step


def init_variant_state(ae_params, disc_params, cfg: VariantConfig):
    ae_opt = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    d_opt = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
    return VariantState(
        step=jnp.zeros((), jnp.int32),
        ae_params=ae_params,
        disc_params=disc_params,
        ae_opt=ae_opt.init(ae_params),
        disc_opt=d_opt.init(disc_params),
    )
