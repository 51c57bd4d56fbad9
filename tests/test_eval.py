"""Eval harness tests: FAD math, CLAP score plumbing, Cnn14 tower."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.eval.clap_score import clap_score, cosine_diag, prepare_clap_audio
from audiolcm_tpu.eval.fad import embedding_statistics, fad_score, frechet_distance
from audiolcm_tpu.models.clap_audio import ClapAudioConfig, Cnn14, logmel_torchlibrosa


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 8))
    mu, sigma = embedding_statistics(emb)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5000, 4))
    mu, sigma = embedding_statistics(emb)
    d = frechet_distance(mu, sigma, mu + 2.0, sigma)
    assert abs(d - 4.0 * 4) < 0.5  # ||2*ones(4)||^2 = 16


def test_fad_score_pluggable_embedding():
    rng = np.random.default_rng(0)
    embed = lambda w: w.reshape(1, -1)[:, :8]
    gen = [rng.standard_normal(16).astype(np.float32) for _ in range(64)]
    bg = [rng.standard_normal(16).astype(np.float32) for _ in range(64)]
    d_same = fad_score(embed, gen, gen)
    d_diff = fad_score(embed, gen, [g + 3 for g in bg])
    assert d_same < 1e-6
    assert d_diff > 1.0


def test_prepare_clap_audio_repeat_pad():
    wav = np.ones(16000, dtype=np.float32)  # 1 s @16k
    out = prepare_clap_audio(wav, duration_s=5.0)
    assert out.shape == (5 * 44100,)
    long = np.ones(16000 * 10, dtype=np.float32)
    out = prepare_clap_audio(long, duration_s=5.0)
    assert out.shape == (5 * 44100,)


def test_cosine_diag():
    t = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    a = jnp.asarray([[2.0, 0.0], [0.0, -1.0]])
    np.testing.assert_allclose(np.asarray(cosine_diag(t, a)), [1.0, -1.0], atol=1e-6)


def test_clap_score_end_to_end_stub():
    text_fn = lambda caps: jnp.asarray([[1.0, 0.0]] * len(caps))
    audio_fn = lambda wavs: jnp.asarray([[1.0, 0.0]] * wavs.shape[0])
    wavs = [np.ones(16000, dtype=np.float32)] * 3
    s = clap_score(text_fn, audio_fn, ["a", "b", "c"], wavs, batch_size=2)
    assert abs(s - 1.0) < 1e-6


def test_logmel_torchlibrosa_matches_torch(rng):
    """Golden vs the documented torchlibrosa math (center=True power stft +
    slaney mel + power_to_db) re-derived with torch."""
    import torch

    cfg = ClapAudioConfig(sample_rate=8000, window_size=64, hop_size=32,
                          mel_bins=8, fmin=50, fmax=4000)
    wav = rng.standard_normal((2, 1000)).astype(np.float32) * 0.1
    ours = np.asarray(logmel_torchlibrosa(jnp.asarray(wav), cfg))

    from audiolcm_tpu.dsp.mel import mel_filterbank

    y = torch.nn.functional.pad(
        torch.from_numpy(wav)[:, None, :], (32, 32), mode="reflect"
    )[:, 0]
    spec = torch.stft(y, 64, hop_length=32, win_length=64,
                      window=torch.hann_window(64), center=False,
                      return_complex=True)
    power = spec.real**2 + spec.imag**2 + 1e-9  # matches our magnitude eps
    melW = torch.from_numpy(mel_filterbank(8000, 64, 8, 50, 4000))
    mel = torch.einsum("mf,bft->btm", melW, power)
    golden = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    np.testing.assert_allclose(ours, golden.numpy(), atol=1e-2)


def test_cnn14_shapes():
    cfg = ClapAudioConfig(sample_rate=8000, window_size=64, hop_size=32,
                          mel_bins=64, fmin=50, fmax=4000, out_emb=32)
    model = Cnn14(cfg)
    wav = jnp.zeros((1, 8000))
    variables = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(variables, wav)
    assert out.shape == (1, 32)


def test_clap_contrastive_model():
    from audiolcm_tpu.models.clap import CLAP, clap_contrastive_loss
    from audiolcm_tpu.models.clap_audio import ClapAudioConfig
    from audiolcm_tpu.models.clap_text import BertConfig

    model = CLAP(
        text_config=BertConfig(vocab_size=40, hidden_size=16, num_layers=1,
                               num_heads=2, intermediate_size=32,
                               max_position_embeddings=16),
        audio_config=ClapAudioConfig(sample_rate=8000, window_size=64,
                                     hop_size=32, mel_bins=64, fmin=50,
                                     fmax=4000, out_emb=32),
        d_proj=24,
    )
    ids = jnp.zeros((3, 8), dtype=jnp.int32)
    wav = jnp.zeros((3, 4000))
    variables = model.init(jax.random.PRNGKey(0), ids, wav)
    t, a, scale = model.apply(variables, ids, wav)
    assert t.shape == (3, 24) and a.shape == (3, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(t), axis=-1), 1.0, atol=1e-5)
    assert abs(float(scale) - 1 / 0.003) < 1.0
    loss = clap_contrastive_loss(t, a, scale)
    assert np.isfinite(float(loss))


def test_convert_cnn14_structure(rng):
    """Cnn14 converter: synthetic PANN-layout state dict -> flax variables
    that load and run."""
    from audiolcm_tpu.models.clap_audio import ClapAudioConfig, Cnn14, convert_cnn14

    cfg = ClapAudioConfig(sample_rate=8000, window_size=64, hop_size=32,
                          mel_bins=64, fmin=50, fmax=4000, out_emb=32)
    widths = [64, 128, 256, 512, 1024, 2048]
    sd = {}
    def bn(p, c):
        for suffix, shape in (("weight", (c,)), ("bias", (c,)),
                              ("running_mean", (c,)), ("running_var", (c,))):
            sd[f"{p}.{suffix}"] = rng.standard_normal(shape).astype(np.float32) ** 2 + 0.1
    bn("bn0", 64)
    cin = 1
    for i, c in enumerate(widths, start=1):
        sd[f"conv_block{i}.conv1.weight"] = rng.standard_normal((c, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"conv_block{i}.conv2.weight"] = rng.standard_normal((c, c, 3, 3)).astype(np.float32) * 0.05
        bn(f"conv_block{i}.bn1", c)
        bn(f"conv_block{i}.bn2", c)
        cin = c
    sd["fc1.weight"] = rng.standard_normal((32, 2048)).astype(np.float32) * 0.05
    sd["fc1.bias"] = np.zeros(32, np.float32)

    variables = jax.tree.map(jnp.asarray, convert_cnn14(sd))
    out = Cnn14(cfg).apply(variables, jnp.zeros((1, 8000)))
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_vggish_golden_vs_torch_functional(rng):
    """JAX VGGish == functional torch re-derivation of the VGG tower under a
    converted torchvggish-layout state dict (pins conv/flatten/linear layout)."""
    import torch
    import torch.nn.functional as F

    from audiolcm_tpu.models.vggish import VGGish, convert_vggish

    conv_shapes = [(64, 1), (128, 64), (256, 128), (256, 256), (512, 256), (512, 512)]
    sd = {}
    for t, (o, i) in zip((0, 3, 6, 8, 11, 13), conv_shapes):
        sd[f"features.{t}.weight"] = rng.standard_normal((o, i, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{t}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.05
    for t, (o, i) in zip((0, 2, 4), [(4096, 12288), (4096, 4096), (128, 4096)]):
        sd[f"embeddings.{t}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.01
        sd[f"embeddings.{t}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.01

    x = rng.standard_normal((2, 96, 64)).astype(np.float32)

    with torch.no_grad():
        h = torch.from_numpy(x)[:, None]  # (B, 1, 96, 64)
        for idx, t in enumerate((0, 3, 6, 8, 11, 13)):
            h = F.relu(F.conv2d(h, torch.from_numpy(sd[f"features.{t}.weight"]),
                                torch.from_numpy(sd[f"features.{t}.bias"]), padding=1))
            if idx in (0, 1, 3, 5):
                h = F.max_pool2d(h, 2, 2)
        h = torch.transpose(h, 1, 3)
        h = torch.transpose(h, 1, 2)
        h = h.contiguous().view(h.size(0), -1)
        for t in (0, 2, 4):
            h = F.relu(F.linear(h, torch.from_numpy(sd[f"embeddings.{t}.weight"]),
                                torch.from_numpy(sd[f"embeddings.{t}.bias"])))
        golden = h.numpy()

    model = VGGish()
    variables = jax.tree.map(jnp.asarray, convert_vggish(sd))
    init_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64))))
    assert jax.tree_util.tree_structure(init_shapes) == jax.tree_util.tree_structure(variables)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == (2, 128)
    np.testing.assert_allclose(out, golden, atol=2e-4)


def test_vggish_fad_embeddings_are_preactivation(rng):
    """embed_waveform defaults to the raw fc2 output (reference FAD builds
    VGGish with use_activation=False, fad.py:53-61): relu(raw) == the full
    forward, and the raw embeddings carry negative values the ReLU'd path
    would destroy."""
    from audiolcm_tpu.models.vggish import VGGish

    model = VGGish()
    wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64)))
    raw = np.asarray(model.embed_waveform(variables, wav))
    full = np.asarray(model.embed_waveform(variables, wav, include_final_relu=True))
    np.testing.assert_allclose(np.maximum(raw, 0.0), full, atol=1e-6)
    assert (raw < 0).any(), "pre-activation embeddings should have negatives"


def test_vggish_log_mel_examples_vs_numpy(rng):
    """Frontend parity with Google's mel_features math (pad-free framing,
    periodic Hann, end-padded rfft, HTK mel, log offset, 96-frame examples)."""
    from audiolcm_tpu.models.vggish import (
        VGGishConfig,
        vggish_log_mel_examples,
        vggish_mel_matrix,
    )

    cfg = VGGishConfig()
    wav = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1

    n_frames = 1 + (16000 - cfg.stft_window) // cfg.stft_hop
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(cfg.stft_window) / cfg.stft_window)
    frames = np.stack([wav[0, i * cfg.stft_hop : i * cfg.stft_hop + cfg.stft_window]
                       for i in range(n_frames)])
    mag = np.abs(np.fft.rfft(frames * window, n=cfg.fft_length, axis=-1))
    mel = np.log(mag @ vggish_mel_matrix(cfg) + cfg.log_offset)
    n_ex = n_frames // cfg.example_frames
    golden = mel[: n_ex * cfg.example_frames].reshape(n_ex, cfg.example_frames, cfg.mel_bins)

    out = np.asarray(vggish_log_mel_examples(jnp.asarray(wav), cfg))
    assert out.shape == (1, n_ex, cfg.example_frames, cfg.mel_bins)
    np.testing.assert_allclose(out[0], golden, atol=1e-4)


def test_vggish_postprocess_quantize():
    from audiolcm_tpu.models.vggish import vggish_postprocess

    emb = jnp.asarray(np.linspace(-5, 5, 2 * 128, dtype=np.float32).reshape(2, 128))
    eig = jnp.eye(128)
    means = jnp.zeros((128,))
    out = np.asarray(vggish_postprocess(emb, eig, means))
    assert out.min() >= 0.0 and out.max() <= 255.0
    raw = np.asarray(vggish_postprocess(emb, eig, means, quantize=False))
    assert raw.min() == -2.0 and raw.max() == 2.0
