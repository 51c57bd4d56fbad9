"""FAD CLI (`wav_evaluation/cal_fad_score.py` parity).

Computes the Frechet Audio Distance between a generated-wav directory and a
background/ground-truth directory. The reference depends on a vendored
torch VGGish that isn't even present in its repo (`metrics/fad.py:18,39`);
here the embedding model is pluggable:
  --vggish_ckpt  : the self-contained JAX VGGish tower (models/vggish.py)
                   loading a torchvggish-layout state dict — the closest
                   match to the reference's intent;
  --clap_weights : the Cnn14 CLAP tower (no VGGish weights needed);
  --use_vggish   : torch-hub VGGish, when network/torch hub is available.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--generated_dir", required=True)
    p.add_argument("--background_dir", required=True)
    p.add_argument("--vggish_ckpt", default=None,
                   help="torchvggish-layout state dict for the JAX VGGish tower")
    p.add_argument("--clap_weights", default=None,
                   help="CLAP_weights_2022.pth (Cnn14 embedding model)")
    p.add_argument("--use_vggish", action="store_true",
                   help="torch-hub VGGish (needs network)")
    p.add_argument("--limit", type=int, default=None)
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None):
    from audiolcm_tpu.eval.fad import fad_score, load_wav_dir

    args = parse_args(argv)
    gen = load_wav_dir(args.generated_dir, args.limit)
    bg = load_wav_dir(args.background_dir, args.limit)

    if args.vggish_ckpt:
        import jax

        from audiolcm_tpu.convert.load_torch import load_state_dict
        from audiolcm_tpu.models.vggish import VGGish, convert_vggish

        model = VGGish()
        variables = jax.tree.map(
            np.asarray, convert_vggish(load_state_dict(args.vggish_ckpt))
        )

        def embed_fn(wav):
            return np.asarray(model.embed_waveform(variables, wav[None, :]))

    elif args.use_vggish:
        import torch

        model = torch.hub.load("harritaylor/torchvggish", "vggish")
        model.eval()

        def embed_fn(wav):
            with torch.no_grad():
                return model.forward(wav, 16000).numpy()

    else:
        if args.clap_weights is None:
            raise SystemExit("pass --vggish_ckpt, --clap_weights or --use_vggish")
        from audiolcm_tpu.cli.cal_clap_score import build_clap_scorers
        from audiolcm_tpu.eval.clap_score import prepare_clap_audio

        _, audio_fn = build_clap_scorers(args.clap_weights, "bert-base-uncased")

        def embed_fn(wav):
            return np.asarray(audio_fn(prepare_clap_audio(wav)[None, :]))

    score = fad_score(embed_fn, gen, bg)
    print(f"FAD: {score:.6f}")


if __name__ == "__main__":
    main()
