"""VAE round-trip CLI: mel -> latent -> mel -> BigVGAN wav.

Behavior parity: `scripts/reconstruct_audio.py`: drives the config's
test_dataset, runs the VAE forward (sampled posterior) on each mel, vocodes
the reconstruction, writes wavs + reports reconstruction MSE
(`autoencoder1d.py:115-139` test_step semantics).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", type=str, required=True)
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("--vocoder-ckpt", dest="vocoder_ckpt", type=str, required=True)
    p.add_argument("--outdir", type=str, default="outputs/reconstructions")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_mel", action="store_true")
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None):
    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.api import _write_wav
    from audiolcm_tpu.convert import convert_bigvgan, convert_vae
    from audiolcm_tpu.convert.load_torch import (
        load_state_dict,
        load_vocoder_dir,
        strip_prefix,
    )
    from audiolcm_tpu.data.tsvdataset import TSVDatasetStruct
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian

    opt = parse_args(argv)
    os.makedirs(opt.outdir, exist_ok=True)

    raw_cfg = cfg_mod.load_yaml(opt.base)
    model_cfg = raw_cfg["model"]
    if "first_stage_config" in model_cfg.get("params", {}):
        vae = cfg_mod.build_from_target(model_cfg["params"]["first_stage_config"])
        vae_prefix = "first_stage_model."
    else:
        vae = cfg_mod.build_from_target(model_cfg)
        vae_prefix = ""
    sd = load_state_dict(opt.resume)
    if vae_prefix:
        sd = strip_prefix(sd, vae_prefix)
    vcfg = vae.config
    vae_params = jax.tree.map(jnp.asarray, convert_vae(
        sd, num_levels=len(vcfg.ch_mult), num_res_blocks=vcfg.num_res_blocks,
        down_layers=vcfg.down_layers, attn_layers=vcfg.attn_layers,
    ))
    voc_sd, voc_args = load_vocoder_dir(opt.vocoder_ckpt)
    vocoder = cfg_mod.build_vocoder_from_args(voc_args)
    bcfg = vocoder.config
    voc_params = jax.tree.map(jnp.asarray, convert_bigvgan(
        voc_sd, num_upsamples=len(bcfg.upsample_rates),
        num_kernels=len(bcfg.resblock_kernel_sizes),
        dilations_per_block=len(bcfg.resblock_dilation_sizes[0]),
        resblock=bcfg.resblock,
    ))

    @jax.jit
    def roundtrip(mel_btc, rng):
        moments = vae.apply({"params": vae_params}, mel_btc,
                            method=AutoencoderKL1D.encode_moments)
        post = DiagonalGaussian(moments)
        z = post.sample(rng)
        recon = vae.apply({"params": vae_params}, z, method=AutoencoderKL1D.decode)
        wav = vocoder.apply({"params": voc_params}, recon)
        return recon, wav

    tds_cfg = raw_cfg.get("test_dataset", {}).get("params", {})
    ds = TSVDatasetStruct(tds_cfg["tsv_path"], tds_cfg.get("spec_crop_len", 624),
                          load_mels=True)
    rng = jax.random.PRNGKey(0)
    mses = []
    for start in range(0, len(ds), opt.batch_size):
        items = [ds[i] for i in range(start, min(start + opt.batch_size, len(ds)))]
        mel = np.stack([it["image"] for it in items])  # (B, 80, T)
        mel_btc = jnp.asarray(mel.transpose(0, 2, 1))
        recon, wav = roundtrip(mel_btc, jax.random.fold_in(rng, start))
        recon = np.asarray(recon).transpose(0, 2, 1)
        mses.append(np.mean((recon - mel) ** 2))
        for it, w, r in zip(items, np.asarray(wav), recon):
            name = it["f_name"]
            _write_wav(os.path.join(opt.outdir, f"{name}.wav"), w, opt.sample_rate)
            if opt.save_mel:
                np.save(os.path.join(opt.outdir, f"{name}.npy"), r)
    print(f"test/mse_loss: {float(np.mean(mses)):.6f}")
    print(f"reconstructions written to {opt.outdir}")


if __name__ == "__main__":
    main()
