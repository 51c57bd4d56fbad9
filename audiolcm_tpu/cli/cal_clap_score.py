"""CLAP-score CLI (`wav_evaluation/cal_clap_score.py` parity).

Reads a tab-separated result.csv (caption/audio_path columns, the output of
cli/txt2audio_for_lcm.py), embeds captions with the CLAP-BERT CLS tower and
wavs with Cnn14, and reports the mean diagonal cosine similarity in batches
of 60. Requires the MS-CLAP weights file and a local bert tokenizer dir.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tsv_path", required=True, help="result.csv (tab-separated)")
    p.add_argument("--clap_weights", required=True, help="CLAP_weights_2022.pth")
    p.add_argument("--bert_path", default="bert-base-uncased")
    p.add_argument("--batch_size", type=int, default=60)
    p.add_argument("--out_csv", default=None)
    return p.parse_args(argv)


def build_clap_scorers(clap_weights: str, bert_path: str):
    """Returns (text_embed_fn, audio_embed_fn) backed by converted weights."""
    from transformers import AutoTokenizer

    from audiolcm_tpu.convert import convert_bert
    from audiolcm_tpu.convert.load_torch import load_state_dict, strip_prefix
    from audiolcm_tpu.models.clap_audio import ClapAudioConfig, Cnn14, convert_cnn14
    from audiolcm_tpu.models.clap_text import BertConfig, BertEncoder, Projection

    sd = load_state_dict(clap_weights, key="model")
    cap = strip_prefix(sd, "caption_encoder.")
    aud = strip_prefix(sd, "audio_encoder.")

    bert = BertEncoder(BertConfig())
    bert_params = jax.tree.map(jnp.asarray, convert_bert(strip_prefix(cap, "base.")))
    tproj = Projection(1024)
    tproj_params = jax.tree.map(jnp.asarray, {
        "linear1": {"kernel": cap["projection.linear1.weight"].T},
        "linear2": {"kernel": cap["projection.linear2.weight"].T},
        "layer_norm": {
            "scale": cap["projection.layer_norm.weight"],
            "bias": cap["projection.layer_norm.bias"],
        },
    })
    tokenizer = AutoTokenizer.from_pretrained(bert_path)

    @jax.jit
    def text_forward(ids):
        h = bert.apply({"params": bert_params}, ids)
        # CLAP-score path uses the CLS vector (clap.py:48-52), unlike the
        # generation path which projects the full sequence
        return tproj.apply({"params": tproj_params}, h[:, 0, :])

    def text_embed_fn(captions: List[str]):
        ids = tokenizer(list(captions), truncation=True, max_length=77,
                        padding="max_length", return_tensors="np")["input_ids"]
        return text_forward(jnp.asarray(ids))

    cnn14 = Cnn14(ClapAudioConfig())
    cnn14_vars = jax.tree.map(jnp.asarray, convert_cnn14(strip_prefix(aud, "base.")))
    aproj_params = jax.tree.map(jnp.asarray, {
        "linear1": {"kernel": aud["projection.linear1.weight"].T},
        "linear2": {"kernel": aud["projection.linear2.weight"].T},
        "layer_norm": {
            "scale": aud["projection.layer_norm.weight"],
            "bias": aud["projection.layer_norm.bias"],
        },
    })
    aproj = Projection(1024)

    @jax.jit
    def audio_forward(wavs):
        emb = cnn14.apply(cnn14_vars, wavs)
        return aproj.apply({"params": aproj_params}, emb)

    return text_embed_fn, audio_forward


def main(argv: Optional[List[str]] = None):
    import pandas as pd
    from scipy.io import wavfile

    from audiolcm_tpu.eval.clap_score import clap_score

    args = parse_args(argv)
    df = pd.read_csv(args.tsv_path, sep="\t")
    captions = df["caption"].tolist()
    wavs = []
    for path in df["audio_path"]:
        _, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        wavs.append(np.asarray(data, dtype=np.float32))

    text_fn, audio_fn = build_clap_scorers(args.clap_weights, args.bert_path)
    score = clap_score(text_fn, audio_fn, captions, wavs, args.batch_size)
    print(f"mean clap score: {score:.6f}")
    if args.out_csv:
        df["clap_score_mean"] = score
        df.to_csv(args.out_csv, sep="\t", index=False)


if __name__ == "__main__":
    main()
