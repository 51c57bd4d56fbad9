"""Generic EMA of parameter pytrees.

Behavior parity: `ldm/modules/ema.py` (LitEma): decay 0.9999 with warm-up
min(decay, (1+n)/(10+n)), plus store/restore swap for eval. (The LCM
target-net uses its own fixed 0.95 rate inside train/lcm_distill.py;
`use_ema: false` in the shipped diffusion configs, so this module serves
the optional ema_scope evaluation path.)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any
    num_updates: jnp.ndarray


def ema_init(params: Any) -> EMAState:
    return EMAState(jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params: Any, decay: float = 0.9999) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    ema = jax.tree.map(
        lambda e, p: e - (1.0 - d) * (e - p), state.params, new_params
    )
    return EMAState(ema, n)
