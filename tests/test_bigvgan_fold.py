"""Batch-1 overlap-discard time folding (nn/fold.py + BigVGAN.fold_t_segments).

The fold must be EXACT: with halo >= stage receptive field and edge segments
aligned with the true signal edges, the folded program computes the same
function as the unfolded one (see nn/fold.py docstring). These tests pin that
in f32 on the full model (both the channels-first and channels-last stage
paths) and check the graceful-skip gates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolcm_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from audiolcm_tpu.nn.fold import (
    fold_legal,
    fold_time,
    stage_fold_halo,
    unfold_time,
)

CFG = BigVGANConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
)


def _mel(t, b=1, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, t, CFG.num_mels),
                             jnp.float32)


def test_fold_unfold_roundtrip_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3), jnp.float32)
    for fold, halo in [(4, 5), (2, 8), (8, 4)]:
        y = fold_time(x, fold, halo)
        assert y.shape == (fold, 64 // fold + 2 * halo, 3)
        back = unfold_time(y, fold, halo, 64 // fold)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_stage_fold_halo_values():
    # production stages: RF 96 at output rate for k=11, dils (1,3,5)
    assert stage_fold_halo(4, 8, CFG.resblock_kernel_sizes,
                           CFG.resblock_dilation_sizes) == 29
    assert stage_fold_halo(2, 4, CFG.resblock_kernel_sizes,
                           CFG.resblock_dilation_sizes) == 53


@pytest.mark.parametrize("cf_max", [48, 0])
def test_fold_exact_vs_unfolded(cf_max):
    """fold=4 output must match fold=0 exactly (f32) on both stage layouts
    (cf_max=48: channels-first narrow path; cf_max=0: channels-last path)."""
    mel = _mel(256)
    base = BigVGAN(CFG, cf_max_channels=cf_max)
    params = base.init(jax.random.PRNGKey(2), mel)
    ref = base.apply(params, mel)
    folded = BigVGAN(CFG, cf_max_channels=cf_max, fold_t_segments=4).apply(
        params, mel
    )
    assert ref.shape == folded.shape == (1, 256 * CFG.total_upsample)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(ref), rtol=1e-5, atol=2e-5
    )


def test_fold_skips_batch_gt1_and_indivisible():
    base = BigVGAN(CFG)
    mel2 = _mel(256, b=2)
    params = base.init(jax.random.PRNGKey(3), mel2)
    ref = base.apply(params, mel2)
    out = BigVGAN(CFG, fold_t_segments=4).apply(params, mel2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # T=250 not divisible by 4: every stage must silently skip the fold
    mel_odd = _mel(250)
    params = base.init(jax.random.PRNGKey(4), mel_odd)
    ref = base.apply(params, mel_odd)
    out = BigVGAN(CFG, fold_t_segments=4).apply(params, mel_odd)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fold_param_tree_identical():
    mel = _mel(256)
    p0 = BigVGAN(CFG).init(jax.random.PRNGKey(5), mel)
    p1 = BigVGAN(CFG, fold_t_segments=4).init(jax.random.PRNGKey(5), mel)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_legal_gates():
    assert fold_legal(256, 4, 29)
    assert not fold_legal(250, 4, 29)   # indivisible
    assert not fold_legal(256, 8, 29)   # 2*halo > L
    assert not fold_legal(256, 1, 29)   # fold < 2
