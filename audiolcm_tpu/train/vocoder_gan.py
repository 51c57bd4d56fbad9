"""BigVGAN vocoder GAN training loop (generator + MPD/MRD discriminators).

Behavior parity: `vocoder/bigvgan/train_vocoder.py:209-270` / `train.py`:
  * D step: LSGAN loss sum_d [mean((1-D(y))^2) + mean(D(y_hat)^2)] over
    MPD + MRD (`models.py:365-377`)
  * G step: 45 * L1(mel(y), mel(y_hat)) + feature-matching
    (2 * sum mean|f_r - f_g|, `models.py:356-362`) + adversarial
    sum mean((1-D(y_hat))^2) (`models.py:380-390`)
  * AdamW(lr=1e-4, betas=(0.8, 0.99)), ExponentialLR gamma 0.999 per epoch

One jitted step per optimizer on the data mesh. The mel loss reuses the
XLA STFT+mel with the vocoder-training constants (fmin 125, fmax 7600).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram


@dataclasses.dataclass(frozen=True)
class VocoderGANConfig:
    learning_rate: float = 1.0e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per-epoch exponential decay
    mel_weight: float = 45.0
    segment_size: int = 8192
    steps_per_epoch: int = 1000  # for the in-graph exponential schedule


class VocoderGANState(NamedTuple):
    step: jnp.ndarray
    gen_params: Any
    mpd_params: Any
    mrd_params: Any
    gen_opt: Any
    disc_opt: Any


def lsgan_d_loss(reals: List[jnp.ndarray], fakes: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(reals, fakes):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def lsgan_g_loss(fakes: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for dg in fakes:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_matching_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def make_vocoder_gan_steps(
    gen_apply: Callable,  # (params, mel_btc) -> wav (B, T)
    mpd_apply: Callable,  # (params, y, y_hat) -> (reals, fakes, fmap_r, fmap_g)
    mrd_apply: Callable,
    cfg: VocoderGANConfig,
    mel_config: MelConfig = MelConfig(fmin=125.0, fmax=7600.0),
):
    melspec = MelSpectrogram(mel_config)

    def lr_schedule(step):
        epoch = step // cfg.steps_per_epoch
        return cfg.learning_rate * cfg.lr_decay ** epoch.astype(jnp.float32)

    gen_opt = optax.adamw(lr_schedule, b1=cfg.adam_b1, b2=cfg.adam_b2)
    disc_opt = optax.adamw(lr_schedule, b1=cfg.adam_b1, b2=cfg.adam_b2)

    def mel_of(wav: jnp.ndarray) -> jnp.ndarray:
        return melspec(wav)

    def disc_step(state: VocoderGANState, mel: jnp.ndarray, wav: jnp.ndarray):
        y_hat = jax.lax.stop_gradient(gen_apply(state.gen_params, mel))

        def loss_fn(disc_params):
            mpd_p, mrd_p = disc_params
            r1, f1, _, _ = mpd_apply(mpd_p, wav, y_hat)
            r2, f2, _, _ = mrd_apply(mrd_p, wav, y_hat)
            return lsgan_d_loss(r1, f1) + lsgan_d_loss(r2, f2)

        loss, grads = jax.value_and_grad(loss_fn)((state.mpd_params, state.mrd_params))
        updates, disc_opt_state = disc_opt.update(
            grads, state.disc_opt, (state.mpd_params, state.mrd_params)
        )
        mpd_params, mrd_params = optax.apply_updates(
            (state.mpd_params, state.mrd_params), updates
        )
        new_state = state._replace(
            mpd_params=mpd_params, mrd_params=mrd_params, disc_opt=disc_opt_state
        )
        return new_state, {"train/disc_loss": loss}

    def gen_step(state: VocoderGANState, mel: jnp.ndarray, wav: jnp.ndarray):
        def loss_fn(gen_params):
            y_hat = gen_apply(gen_params, mel)
            mel_loss = jnp.mean(jnp.abs(mel_of(wav) - mel_of(y_hat))) * cfg.mel_weight
            _, f1, fr1, fg1 = mpd_apply(state.mpd_params, wav, y_hat)
            _, f2, fr2, fg2 = mrd_apply(state.mrd_params, wav, y_hat)
            fm = feature_matching_loss(fr1, fg1) + feature_matching_loss(fr2, fg2)
            adv = lsgan_g_loss(f1) + lsgan_g_loss(f2)
            loss = mel_loss + fm + adv
            return loss, {
                "train/gen_loss": loss,
                "train/mel_loss": mel_loss,
                "train/fm_loss": fm,
                "train/adv_loss": adv,
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gen_params
        )
        updates, gen_opt_state = gen_opt.update(grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)
        new_state = state._replace(
            step=state.step + 1, gen_params=gen_params, gen_opt=gen_opt_state
        )
        return new_state, metrics

    def init_state(gen_params, mpd_params, mrd_params) -> VocoderGANState:
        return VocoderGANState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            mpd_params=mpd_params,
            mrd_params=mrd_params,
            gen_opt=gen_opt.init(gen_params),
            disc_opt=disc_opt.init((mpd_params, mrd_params)),
        )

    return gen_step, disc_step, init_state
