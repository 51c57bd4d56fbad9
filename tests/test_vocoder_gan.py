"""Vocoder GAN trainer smoke tests with tiny models."""

import numpy as np

import jax
import jax.numpy as jnp

from audiolcm_tpu.dsp.mel import MelConfig
from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.models.vocoder_discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
)
from audiolcm_tpu.train.vocoder_gan import (
    VocoderGANConfig,
    feature_matching_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    make_vocoder_gan_steps,
)


def test_losses_match_reference_formulas():
    r = [jnp.ones((2, 4))]
    g = [jnp.zeros((2, 4))]
    assert float(lsgan_d_loss(r, g)) == 0.0
    assert float(lsgan_g_loss(g)) == 1.0
    fm = feature_matching_loss([[jnp.ones((2, 3))]], [[jnp.zeros((2, 3))]])
    assert float(fm) == 2.0  # 2 * mean|1-0|


def test_discriminators_shapes():
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    mrd = MultiResolutionDiscriminator(resolutions=((128, 32, 64),))
    wav = jnp.zeros((2, 512))
    p1 = mpd.init(jax.random.PRNGKey(0), wav, wav)
    reals, fakes, fr, fg = mpd.apply(p1, wav, wav)
    assert len(reals) == 2 and len(fr[0]) == 6
    p2 = mrd.init(jax.random.PRNGKey(0), wav, wav)
    reals, fakes, fr, fg = mrd.apply(p2, wav, wav)
    assert len(reals) == 1 and len(fr[0]) == 6
    # identical inputs -> identical logits
    np.testing.assert_allclose(np.asarray(reals[0]), np.asarray(fakes[0]))


def test_vocoder_gan_steps_run():
    gen = BigVGAN(
        BigVGANConfig(num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=16, resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1,),))
    )
    mpd = MultiPeriodDiscriminator(periods=(2,))
    mrd = MultiResolutionDiscriminator(resolutions=((64, 16, 32),))
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, 32, 8))
    wav = jax.random.normal(rng, (1, 32 * 8)) * 0.1

    gen_params = gen.init(rng, mel)["params"]
    mpd_params = mpd.init(rng, wav, wav)["params"]
    mrd_params = mrd.init(rng, wav, wav)["params"]

    mel_cfg = MelConfig(sample_rate=16000, n_fft=64, win_size=64, hop_size=32, n_mels=8,
                        fmin=125.0, fmax=7600.0)
    gen_step, disc_step, init_state = make_vocoder_gan_steps(
        lambda p, m: gen.apply({"params": p}, m),
        lambda p, y, yh: mpd.apply({"params": p}, y, yh),
        lambda p, y, yh: mrd.apply({"params": p}, y, yh),
        VocoderGANConfig(learning_rate=1e-4),
        mel_cfg,
    )
    state = init_state(gen_params, mpd_params, mrd_params)
    state, dm = jax.jit(disc_step)(state, mel, wav)
    state, gm = jax.jit(gen_step)(state, mel, wav)
    for k in ("train/gen_loss", "train/mel_loss", "train/fm_loss", "train/adv_loss"):
        assert np.isfinite(float(gm[k])), k
    assert np.isfinite(float(dm["train/disc_loss"]))
    assert int(state.step) == 1


def test_pair_batch_mode_exact():
    """pair_batch=True (one 2B apply per sub-disc) matches the two-apply
    layout — d(cat) == cat(d) for shared-param pure-conv stacks. Equality is
    mathematical, not bitwise: XLA may tile a 2B conv differently, so allow
    float-rounding noise."""
    from audiolcm_tpu.models.vocoder_discriminators import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator)

    rng = jax.random.PRNGKey(3)
    y = jax.random.normal(rng, (2, 512))
    y_hat = jax.random.normal(jax.random.fold_in(rng, 1), (2, 512))
    close = lambda xa, xb: np.testing.assert_allclose(
        np.asarray(xa), np.asarray(xb), rtol=2e-3, atol=1e-6)
    for fold in ("width", "batch"):
        a = MultiPeriodDiscriminator(periods=(2, 3), fold_mode=fold)
        b = MultiPeriodDiscriminator(periods=(2, 3), fold_mode=fold,
                                     pair_batch=True)
        params = a.init(rng, y, y_hat)
        ra, fa, fra, fga = a.apply(params, y, y_hat)
        rb, fb, frb, fgb = b.apply(params, y, y_hat)
        for xs, ys in ((ra, rb), (fa, fb)):
            for xa, xb in zip(xs, ys):
                close(xa, xb)
        for fs, gs in ((fra, frb), (fga, fgb)):
            for da, db in zip(fs, gs):
                for xa, xb in zip(da, db):
                    close(xa, xb)
    a = MultiResolutionDiscriminator(resolutions=((128, 32, 64),))
    b = MultiResolutionDiscriminator(resolutions=((128, 32, 64),),
                                     pair_batch=True)
    params = a.init(rng, y, y_hat)
    ra, fa, fra, fga = a.apply(params, y, y_hat)
    rb, fb, frb, fgb = b.apply(params, y, y_hat)
    close(ra[0], rb[0])
    close(fa[0], fb[0])
    for da, db in zip(fra[0] + fga[0], frb[0] + fgb[0]):
        close(da, db)


def test_discriminator_p_fold_modes_equivalent():
    """fold_mode='batch' (period folded into the batch axis — the TPU layout
    experiment, VERDICT r4 #7) is an exact permutation of the reference
    'width' layout: same params, logits related by a (p, h') transpose, and
    every feature map carries identical values. LSGAN/FM losses are
    elementwise means, so training dynamics are identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolcm_tpu.models.vocoder_discriminators import DiscriminatorP

    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 302))  # not a multiple of p: pads
    for p in (2, 5):
        d_w = DiscriminatorP(p, fold_mode="width")
        d_b = DiscriminatorP(p, fold_mode="batch")
        params = d_w.init(rng, wav)
        lw, fw = d_w.apply(params, wav)
        lb, fb = d_b.apply(params, wav)
        b = wav.shape[0]
        hp = lw.shape[1] // p  # width layout flattens (h', p)
        # batch layout flattens (p, h') -> transpose matches width layout
        lb_as_w = lb.reshape(b, p, hp).transpose(0, 2, 1).reshape(b, -1)
        np.testing.assert_allclose(np.asarray(lb_as_w), np.asarray(lw),
                                   rtol=0, atol=2e-5)
        for a, c in zip(fw, fb):
            # fmaps: (b, h, p, C) vs (b*p, h, 1, C) — same multiset of values
            np.testing.assert_allclose(
                np.asarray(a.transpose(0, 2, 1, 3).reshape(-1)),
                np.asarray(c.reshape(-1)), rtol=0, atol=2e-5)


def test_mrd_stft_matmul_equivalent():
    """stft_matmul=True (DFT-as-matmul, dsp.mel.stft_magnitude_matmul — the
    TPU MXU formulation of the MRD STFTs) matches the rfft path at matmul-
    reassociation level: same param tree, logits/fmaps numerically close."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiolcm_tpu.dsp.mel import stft_magnitude, stft_magnitude_matmul
    from audiolcm_tpu.models.vocoder_discriminators import (
        MultiResolutionDiscriminator,
    )

    rng = jax.random.PRNGKey(7)
    wav = jax.random.normal(rng, (2, 8192), jnp.float32)

    # raw STFT magnitude at all three MRD resolutions
    for n_fft, hop, win in ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240)):
        window = jnp.ones((win,), jnp.float32)
        pad = (n_fft - hop) // 2
        y = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        a = stft_magnitude(y, window, n_fft, hop, win)
        b = stft_magnitude_matmul(y, window, n_fft, hop, win)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # full discriminator: identical param tree, close outputs
    y_hat = jax.random.normal(jax.random.PRNGKey(8), (2, 8192), jnp.float32)
    d_fft = MultiResolutionDiscriminator()
    d_mm = MultiResolutionDiscriminator(stft_matmul=True)
    params = d_fft.init(rng, wav, y_hat)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(d_mm.init(rng, wav, y_hat)))
    ra, fa, fra, fga = d_fft.apply(params, wav, y_hat)
    rb, fb, frb, fgb = d_mm.apply(params, wav, y_hat)
    for a, b in zip(ra + fa, rb + fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
