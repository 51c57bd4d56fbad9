import numpy as np

import jax.numpy as jnp

from audiolcm_tpu.eval.mrstft import mrstft_loss
from audiolcm_tpu.train.ema import ema_init, ema_update


def test_ema_warmup_rate():
    params = {"w": jnp.zeros(3)}
    state = ema_init(params)
    new = {"w": jnp.ones(3)}
    state = ema_update(state, new, decay=0.9999)
    # first update: d = min(0.9999, 2/11); ema = 0 - (1-d)(0-1) = 1-d
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0 - d, rtol=1e-5)
    assert int(state.num_updates) == 1


def test_ema_converges():
    state = ema_init({"w": jnp.zeros(())})
    for _ in range(200):
        state = ema_update(state, {"w": jnp.ones(())}, decay=0.9)
    assert float(state.params["w"]) > 0.99


def test_mrstft_zero_for_identical():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    res = ((256, 64, 128),)
    assert float(mrstft_loss(y, y, res)) < 1e-5
    noisy = y + 0.5 * jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    assert float(mrstft_loss(y, noisy, res)) > 0.05
