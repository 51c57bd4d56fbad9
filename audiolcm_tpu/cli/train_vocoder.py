"""BigVGAN vocoder training CLI (`vocoder/bigvgan/train.py` parity).

Reads the JSON config (`bigvgan_audioset16khz_80band.json` schema), builds
generator + MPD/MRD discriminators, and drives the alternating GAN loop
over random wav segments (segment_size 8192 -> 32 mel frames). The
reference's `train_vocoder.py` imports a missing `audiodataset` module
(broken as shipped, SURVEY.md §2.6); this trainer feeds from a TSV of
audio_paths instead.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="bigvgan json config")
    p.add_argument("--tsv_path", required=True, help="TSV with audio_path column")
    p.add_argument("--checkpoint_path", default="logs/vocoder")
    p.add_argument("--training_epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=1234)
    return p.parse_args(argv)


def segment_loader(
    tsv_path: str, batch_size: int, segment_size: int, hop: int, seed: int,
    mel_fn,
) -> Iterator[dict]:
    """Random fixed-size wav segments + their mels (meldataset.py semantics)."""
    import pandas as pd

    from audiolcm_tpu.data.melprep import load_wav_mono_16k

    df = pd.read_csv(tsv_path, sep="\t")
    rng = np.random.default_rng(seed)
    wavs = []
    for path in df["audio_path"]:
        wav = load_wav_mono_16k(path)
        if wav is not None and len(wav) >= segment_size:
            wavs.append(wav)
    if not wavs:
        raise ValueError("no usable wavs >= segment_size")
    while True:
        seg = np.stack([
            w[(s := rng.integers(0, len(w) - segment_size + 1)) : s + segment_size]
            for w in (wavs[i] for i in rng.integers(0, len(wavs), batch_size))
        ])
        mel = np.asarray(mel_fn(seg))  # (B, mels, frames)
        yield {"wav": seg, "mel": mel.transpose(0, 2, 1)}


def main(argv: Optional[List[str]] = None):
    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram
    from audiolcm_tpu.models.vocoder_discriminators import (
        MultiPeriodDiscriminator,
        MultiResolutionDiscriminator,
    )
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.loop import Trainer
    from audiolcm_tpu.train.vocoder_gan import VocoderGANConfig, make_vocoder_gan_steps

    args = parse_args(argv)
    with open(args.config) as f:
        h = json.load(f)

    gen = cfg_mod.build_vocoder_from_args(h)
    mpd = MultiPeriodDiscriminator(periods=tuple(h.get("mpd_reshapes", (2, 3, 5, 7, 11))),
                                   d_mult=h.get("discriminator_channel_mult", 1))
    mrd = MultiResolutionDiscriminator(
        resolutions=tuple(tuple(r) for r in h.get("resolutions",
                          ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240)))),
        d_mult=h.get("discriminator_channel_mult", 1),
    )

    mel_cfg = MelConfig(
        sample_rate=h["sampling_rate"], n_fft=h["n_fft"], win_size=h["win_size"],
        hop_size=h["hop_size"], n_mels=h["num_mels"], fmin=h["fmin"], fmax=h["fmax"],
    )
    melspec = MelSpectrogram(mel_cfg)

    segment_size = h.get("segment_size", 8192)
    frames = segment_size // h["hop_size"] + 1
    rng = jax.random.PRNGKey(args.seed)
    mel0 = jnp.zeros((1, frames, h["num_mels"]))
    wav0 = jnp.zeros((1, frames * h["hop_size"]))
    gen_params = gen.init(rng, mel0)["params"]
    mpd_params = mpd.init(rng, wav0, wav0)["params"]
    mrd_params = mrd.init(rng, wav0, wav0)["params"]

    vcfg = VocoderGANConfig(
        learning_rate=h.get("learning_rate", 1e-4),
        adam_b1=h.get("adam_b1", 0.8), adam_b2=h.get("adam_b2", 0.99),
        lr_decay=h.get("lr_decay", 0.999), segment_size=segment_size,
    )
    # loss-mel uses fmax_for_loss (None -> full band), train.py semantics
    loss_mel_cfg = MelConfig(
        sample_rate=h["sampling_rate"], n_fft=h["n_fft"], win_size=h["win_size"],
        hop_size=h["hop_size"], n_mels=h["num_mels"], fmin=h["fmin"],
        fmax=h.get("fmax_for_loss") or h["sampling_rate"] / 2,
    )
    gen_step, disc_step, init_state = make_vocoder_gan_steps(
        lambda p, m: gen.apply({"params": p}, m),
        lambda p, y, yh: mpd.apply({"params": p}, y, yh),
        lambda p, y, yh: mrd.apply({"params": p}, y, yh),
        vcfg, loss_mel_cfg,
    )
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)
    state = init_state(gen_params, mpd_params, mrd_params)

    def step_fn(state, batch, rng):
        mel = jnp.asarray(batch["mel"])
        wav = jnp.asarray(batch["wav"])
        # match generator output length (T_mel * hop)
        wav = wav[:, : mel.shape[1] * h["hop_size"]]
        state, dm = disc_step(state, mel, wav)
        state, gm = gen_step(state, mel, wav)
        return state, {**dm, **gm}

    loader = segment_loader(args.tsv_path, h.get("batch_size", 32), segment_size,
                            h["hop_size"], args.seed, melspec)
    steps_per_epoch = 1000

    def loader_factory(epoch):
        for _ in range(steps_per_epoch):
            yield next(loader)

    ckpt = CheckpointManager(os.path.join(args.checkpoint_path, "checkpoints"))
    Trainer(step_fn, state, args.checkpoint_path, checkpoints=ckpt).fit(
        loader_factory, num_epochs=args.training_epochs, rng=rng
    )


if __name__ == "__main__":
    main()
