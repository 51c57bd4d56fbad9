"""One-command acceptance loop: convert -> generate -> CLAP + FAD JSON.

Composes the reference's three-script quality pipeline
(`scripts/txt2audio_for_lcm.py:240-262` generation over the audiocaps test
TSV, `wav_evaluation/cal_clap_score.py:21-58` CLAP, `wav_evaluation/
cal_fad_score.py` FAD) into a single command so real checkpoints are a
drop-in:

    python -m audiolcm_tpu.cli.eval_acceptance \
        -b configs/audiolcm.yaml --ckpt model.ckpt --vocoder-ckpt vocoder/ \
        --tsv audiocaps_test_16000_struct.tsv \
        --clap_weights CLAP_weights_2022.pth --vggish_ckpt vggish.pth

Emits ONE JSON line: {"clap_score", "clap_gt_anchor", "fad", "fad_embedder",
"n_clips", "outdir"}. Scorer weights are optional: without --clap_weights
the CLAP field is null; without --vggish_ckpt FAD falls back to the
checkpoint-free log-mel-stats embedder, so the loop always runs end-to-end
(rehearsable on synthetic weights today, meaningful scores the moment real
checkpoints appear). GT anchor: AudioCaps val CLAP = 0.479077
(`cal_clap_score.py:21`).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", required=True, help="model config yaml")
    p.add_argument("--ckpt", required=True, help="main model checkpoint (torch or native)")
    p.add_argument("--vocoder-ckpt", dest="vocoder_ckpt", required=True)
    p.add_argument("--tsv", required=True, help="test-set TSV (audiocaps_test_..._struct.tsv)")
    p.add_argument("--outdir", default="outputs/acceptance")
    p.add_argument("--limit", type=int, default=None, help="cap the number of test rows")
    p.add_argument("--ddim_steps", type=int, default=2)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--W", type=int, default=312)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bert_path", default="bert-base-uncased")
    p.add_argument("--t5_path", default="t5-v1_1-large")
    p.add_argument("--clap_weights", default=None,
                   help="CLAP_weights_2022.pth; omit to skip the CLAP score")
    p.add_argument("--vggish_ckpt", default=None,
                   help="torchvggish state dict for FAD; omit for log-mel-stats FAD")
    p.add_argument("--gt_dir", default=None,
                   help="ground-truth wav dir for FAD; default: the TSV's audio_path files")
    p.add_argument("--skip_generate", action="store_true",
                   help="reuse an existing outdir/result.csv")
    p.add_argument("--out_json", default=None, help="default: <outdir>/acceptance.json")
    return p.parse_args(argv)


def _fad(args, gen_wavs: List, out: dict) -> None:
    import numpy as np

    from audiolcm_tpu.eval.fad import (
        fad_score,
        load_wav_dir,
        load_wav_paths,
        make_logmel_stats_embedder,
    )

    if args.gt_dir:
        bg = load_wav_dir(args.gt_dir, args.limit)
    else:
        import pandas as pd

        df = pd.read_csv(args.tsv, sep="\t")
        paths = [p for p in df["audio_path"].tolist()[: args.limit or None]
                 if isinstance(p, str) and os.path.exists(p) and p.endswith(".wav")]
        bg = load_wav_paths(paths)
    if not bg:
        out["fad"] = None
        out["fad_embedder"] = None
        out["fad_note"] = "no ground-truth wavs found (pass --gt_dir)"
        return

    if args.vggish_ckpt:
        import jax

        from audiolcm_tpu.convert.load_torch import load_state_dict
        from audiolcm_tpu.models.vggish import VGGish, convert_vggish

        model = VGGish()
        variables = jax.tree.map(
            np.asarray, convert_vggish(load_state_dict(args.vggish_ckpt))
        )
        # pre-activation fc2 embeddings — the FAD convention (fad.py:53-61)
        embed = lambda w: np.asarray(model.embed_waveform(variables, w[None, :]))
        out["fad_embedder"] = "vggish"
    else:
        embed = make_logmel_stats_embedder()
        out["fad_embedder"] = "logmel_stats"
    out["fad"] = fad_score(embed, gen_wavs, bg)


def main(argv: Optional[List[str]] = None) -> dict:
    args = parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)

    if not args.skip_generate:
        from audiolcm_tpu.cli.txt2audio_for_lcm import main as generate

        gen_argv = [
            "--test-dataset", args.tsv, "-b", args.base, "-r", args.ckpt,
            "--vocoder-ckpt", args.vocoder_ckpt, "--outdir", args.outdir,
            "--ddim_steps", str(args.ddim_steps), "--scale", str(args.scale),
            "--W", str(args.W), "--batch_size", str(args.batch_size),
            "--seed", str(args.seed), "--bert_path", args.bert_path,
            "--t5_path", args.t5_path,
        ]
        if args.limit is not None:
            gen_argv += ["--limit", str(args.limit)]
        generate(gen_argv)

    import pandas as pd

    from audiolcm_tpu.eval.fad import load_wav_paths

    df = pd.read_csv(os.path.join(args.outdir, "result.csv"), sep="\t")
    captions = df["caption"].tolist()
    gen_wavs = load_wav_paths(df["audio_path"].tolist())
    out: dict = {"n_clips": len(gen_wavs), "outdir": args.outdir,
                 "clap_gt_anchor": 0.479077}

    if args.clap_weights:
        from audiolcm_tpu.cli.cal_clap_score import build_clap_scorers
        from audiolcm_tpu.eval.clap_score import clap_score

        text_fn, audio_fn = build_clap_scorers(args.clap_weights, args.bert_path)
        out["clap_score"] = clap_score(text_fn, audio_fn, captions, gen_wavs)
    else:
        out["clap_score"] = None

    _fad(args, gen_wavs, out)

    path = args.out_json or os.path.join(args.outdir, "acceptance.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
