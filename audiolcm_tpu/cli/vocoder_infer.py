"""Standalone BigVGAN inference CLIs.

Behavior parity with the reference's two hifi-gan-derived scripts:

- wav mode (`--input_wavs_dir`): `vocoder/bigvgan/inference.py` — load each
  wav, compute its mel with the vocoder config's STFT constants via
  `meldataset.mel_spectrogram` semantics (natural log,
  `meldataset.py:38-60`), vocode, write `<stem>_generated.wav` as int16
  scaled by MAX_WAV_VALUE (`inference.py:56-73`).
- mel mode (`--input_mels_dir`): `vocoder/bigvgan/inference_e2e.py` — load
  each `.npy` (num_mels, T) mel, vocode, write `<stem>_generated_e2e.wav`
  (`inference_e2e.py:45-66`).

Checkpoint resolution: `--checkpoint_file` may be the reference-style
generator file (config read from a sibling `config.json`/`args.yml`,
`inference.py:82-88`) or a converted-vocoder directory
(`best_netG.pt` + `args.yml`, the layout `convert.load_torch.load_vocoder_dir`
consumes).

One deliberate deviation: int16 conversion clips to the int16 range instead
of reproducing numpy's wraparound on overflowing samples.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np

MAX_WAV_VALUE = 32768.0  # meldataset.py:19


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--input_wavs_dir", default=None)
    g.add_argument("--input_mels_dir", default=None)
    p.add_argument("--output_dir", default="generated_files")
    p.add_argument("--checkpoint_file", required=True)
    return p.parse_args(argv)


def load_generator(checkpoint_file: str):
    """(vocoder_module, params, args_dict) from either checkpoint layout."""
    import jax
    import jax.numpy as jnp

    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.convert import convert_bigvgan
    from audiolcm_tpu.convert.load_torch import load_state_dict, load_vocoder_dir

    if os.path.isdir(checkpoint_file):
        sd, args = load_vocoder_dir(checkpoint_file)
    else:
        sd = load_state_dict(checkpoint_file, key="generator")
        d = os.path.dirname(os.path.abspath(checkpoint_file))
        cfg_json = os.path.join(d, "config.json")
        args_yml = os.path.join(d, "args.yml")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                args = json.load(f)
        else:
            import yaml

            with open(args_yml) as f:
                args = yaml.safe_load(f)
    vocoder = cfg_mod.build_vocoder_from_args(args)
    bcfg = vocoder.config
    params = jax.tree.map(jnp.asarray, convert_bigvgan(
        sd, num_upsamples=len(bcfg.upsample_rates),
        num_kernels=len(bcfg.resblock_kernel_sizes),
        dilations_per_block=len(bcfg.resblock_dilation_sizes[0]),
        resblock=bcfg.resblock,
    ))
    return vocoder, params, args


def _write_int16(path: str, wav: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile

    audio = np.asarray(wav, dtype=np.float32) * MAX_WAV_VALUE
    audio = np.clip(audio, -32768.0, 32767.0).astype(np.int16)
    wavfile.write(path, sample_rate, audio)
    print(path)


def main(argv: Optional[List[str]] = None):
    import jax
    import jax.numpy as jnp

    from audiolcm_tpu.dsp.mel import MelConfig, MelSpectrogram

    a = parse_args(argv)
    vocoder, params, h = load_generator(a.checkpoint_file)
    os.makedirs(a.output_dir, exist_ok=True)
    sr = int(h.get("sampling_rate", 16000))

    # jit once per distinct mel length (the scripts process arbitrary-length
    # files one at a time; XLA shapes are static, so each new T compiles)
    vocode = jax.jit(lambda m: vocoder.apply({"params": params}, m))

    if a.input_wavs_dir is not None:
        from audiolcm_tpu.data.melprep import load_wav_mono_16k

        mel_fn = MelSpectrogram(MelConfig(
            sample_rate=sr, n_fft=int(h["n_fft"]), win_size=int(h["win_size"]),
            hop_size=int(h["hop_size"]), n_mels=int(h["num_mels"]),
            fmin=float(h["fmin"]), fmax=float(h["fmax"]), log_base="e",
        ))
        for fname in sorted(os.listdir(a.input_wavs_dir)):
            wav = load_wav_mono_16k(os.path.join(a.input_wavs_dir, fname),
                                    target_sr=sr)
            if wav is None:
                continue
            mel = mel_fn(jnp.asarray(wav)[None, :])  # (1, num_mels, T)
            out = np.asarray(vocode(jnp.transpose(mel, (0, 2, 1))))[0]
            _write_int16(
                os.path.join(a.output_dir,
                             os.path.splitext(fname)[0] + "_generated.wav"),
                out, sr)
    else:
        for fname in sorted(os.listdir(a.input_mels_dir)):
            if not fname.endswith(".npy"):
                continue
            x = np.load(os.path.join(a.input_mels_dir, fname))
            if x.ndim == 2:  # (num_mels, T) -> (1, num_mels, T)
                x = x[None]
            out = np.asarray(vocode(jnp.asarray(x.transpose(0, 2, 1))))[0]
            _write_int16(
                os.path.join(a.output_dir,
                             os.path.splitext(fname)[0] + "_generated_e2e.wav"),
                out, sr)


if __name__ == "__main__":
    main()
