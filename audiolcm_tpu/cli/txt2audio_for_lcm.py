"""Text-to-audio generation CLI — flag parity with the reference.

Behavior parity: `scripts/txt2audio_for_lcm.py` (LCM path) and
`scripts/txt2audio_for_2cap.py` (teacher path via --teacher/--plms):
same flags (--ddim_steps, -b/--base, -r/--resume, --vocoder-ckpt,
--test-dataset, --outdir, --scale, --n_samples, --prompt_txt,
--sample_rate), same output naming ({name}_sample_{num}_{idx}.wav), same
tab-separated result.csv with caption/audio_path columns.

TPU redesign: test-set prompts run as real device batches (--batch_size)
through one compiled program per duration bucket, instead of the
reference's one-clip-at-a-time python loop.
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
    p.add_argument("--prompt_txt", type=str, default="prompt.txt")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--test-dataset", dest="test_dataset", default="none",
                   help="dataset name (tsv comes from the config), or a "
                        "direct path to a .tsv file")
    p.add_argument("--limit", type=int, default=None,
                   help="generate only the first N test-set rows")
    p.add_argument("--outdir", type=str, default="outputs/txt2audio-samples")
    p.add_argument("--ddim_steps", type=int, default=2)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--teacher", action="store_true", help="use the DDIM teacher path")
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=20)
    p.add_argument("--W", type=int, default=312)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-b", "--base", type=str, default="")
    p.add_argument("--vocoder-ckpt", dest="vocoder_ckpt", type=str,
                   default="vocoder/logs/audioset")
    p.add_argument("--bert_path", type=str, default="bert-base-uncased")
    p.add_argument("--t5_path", type=str, default="t5-v1_1-large")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _gen_batch(pipeline, tokenizers, prompts: List[dict], latent_len: int, seed: int,
               teacher_opts: Optional[dict] = None):
    """prompts: [{'ori_caption','struct_caption'}]. Returns (B, T_wav) numpy."""
    clap_ids, t5_ids = tokenizers(
        [p["ori_caption"] for p in prompts], [p["struct_caption"] for p in prompts]
    )
    if teacher_opts is not None:
        context = pipeline.encode_text_ids(clap_ids, t5_ids)
        uc_ids = tokenizers([""], [""])
        uncond = pipeline.encode_text_ids(*uc_ids)
        wav, mel = pipeline.generate_teacher(
            jax.random.PRNGKey(seed), context, uncond, latent_len,
            num_steps=teacher_opts["steps"],
            guidance_scale=teacher_opts["scale"],
            use_plms=teacher_opts["plms"],
        )
    else:
        wav, mel = pipeline.generate_jit(
            jax.random.PRNGKey(seed), clap_ids, t5_ids, latent_len
        )
    return np.asarray(wav), np.asarray(mel)


def main(argv: Optional[List[str]] = None):
    from audiolcm_tpu.api import Tokenizers, _write_wav, build_pipeline
    from audiolcm_tpu.data.tsvdataset import TSVDatasetStruct
    from audiolcm_tpu import config as cfg_mod

    opt = parse_args(argv)
    os.makedirs(opt.outdir, exist_ok=True)

    pipeline = build_pipeline(
        opt.base, opt.resume or None, opt.vocoder_ckpt,
        num_inference_steps=opt.ddim_steps, guidance_scale=opt.scale,
    )
    tokenizers = Tokenizers(opt.bert_path, opt.t5_path)
    latent_len = opt.W
    # teacher path: DDIM/PLMS over the frozen teacher net (--ddim_steps 100)
    teacher_opts = (
        {"steps": opt.ddim_steps, "scale": opt.scale, "plms": opt.plms}
        if (opt.teacher or opt.plms)
        else None
    )

    records = []
    if opt.test_dataset != "none":
        raw_cfg = cfg_mod.load_yaml(opt.base)
        tds_cfg = raw_cfg.get("test_dataset", {}).get("params", {})
        # a direct .tsv path overrides the config (acceptance-loop use)
        if opt.test_dataset.endswith(".tsv") and os.path.exists(opt.test_dataset):
            tsv_path = opt.test_dataset
        else:
            tsv_path = tds_cfg.get("tsv_path", "audiocaps_test_16000_struct.tsv")
        ds = TSVDatasetStruct(tsv_path, tds_cfg.get("spec_crop_len", 624))
        n_rows = len(ds) if opt.limit is None else min(opt.limit, len(ds))
        items = [ds[i] for i in range(n_rows)]
        for start in range(0, len(items), opt.batch_size):
            chunk = items[start : start + opt.batch_size]
            pad = opt.batch_size - len(chunk)
            prompts = [it["caption"] for it in chunk] + [
                {"ori_caption": "", "struct_caption": ""}
            ] * pad
            wavs, _ = _gen_batch(pipeline, tokenizers, prompts, latent_len,
                                 opt.seed + start, teacher_opts)
            for it, wav in zip(chunk, wavs):
                f_name = it["f_name"]
                split_at = f_name.rfind("_")
                v_n, num = f_name[:split_at], f_name[split_at + 1 :]
                for idx in range(opt.n_samples):
                    wav_path = os.path.join(opt.outdir, f"{v_n}_sample_{num}_{idx}.wav")
                    _write_wav(wav_path, wav, opt.sample_rate)
                    records.append(
                        {"caption": it["caption"]["ori_caption"], "audio_path": wav_path}
                    )
        import pandas as pd

        pd.DataFrame.from_dict(records).to_csv(
            os.path.join(opt.outdir, "result.csv"), sep="\t", index=False
        )
    else:
        with open(opt.prompt_txt) as f:
            prompts = [line.strip() for line in f if line.strip()]
        for start in range(0, len(prompts), opt.batch_size):
            chunk = prompts[start : start + opt.batch_size]
            pad = opt.batch_size - len(chunk)
            pdicts = [
                {"ori_caption": c, "struct_caption": f"<{c}& all>"} for c in chunk
            ] + [{"ori_caption": "", "struct_caption": ""}] * pad
            wavs, _ = _gen_batch(pipeline, tokenizers, pdicts, latent_len,
                                 opt.seed + start, teacher_opts)
            for c, wav in zip(chunk, wavs):
                name = c.replace(" ", "-")
                _write_wav(os.path.join(opt.outdir, f"{name}_0.wav"), wav, opt.sample_rate)

    print(f"Your samples are ready and waiting for you here: \n{opt.outdir} \nEnjoy.")


if __name__ == "__main__":
    main()
