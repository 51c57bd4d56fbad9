"""LR-multiplier schedules, parity with `ldm/lr_scheduler.py`.

The reference exposes three lambda schedulers (used with base_lr=1.0 via
Lightning's LambdaLR, `main.py` scheduler_config plumbing):

- LambdaWarmUpCosineScheduler   (`ldm/lr_scheduler.py:4-33`): scalar-arg
  linear warm-up then single cosine decay to lr_min.
- LambdaWarmUpCosineScheduler2  (`ldm/lr_scheduler.py:36-79`): list-arg
  repeated cycles, warm-up + cosine within each cycle.
- LambdaLinearScheduler         (`ldm/lr_scheduler.py:81-97`): list-arg
  cycles, warm-up + linear decay f_max -> f_min across the cycle.

Here each is a pure-jnp `optax.Schedule` (step-traced, jit-safe: no Python
branches on the step), returning base_lr * f(step). `build_schedule` resolves
a YAML `scheduler_config` block exactly as the reference's
`instantiate_from_config(scheduler_config)` would (`main.py` / `ddpm.py`
configure_optimizers), falling back to the shipped LambdaLinear defaults.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
import optax


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int) -> optax.Schedule:
    """LambdaWarmUpCosineScheduler (`ldm/lr_scheduler.py:17-30`)."""

    def fn(step):
        n = jnp.asarray(step, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum(
            (n - warm_up_steps) / (max_decay_steps - warm_up_steps), 1.0)
        decay = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, decay)

    return fn


def _cycle_arrays(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) \
        == len(cycle_lengths), "per-cycle lists must be equal length"
    cum = np.cumsum([0] + list(cycle_lengths))
    return (jnp.asarray(warm_up_steps, jnp.float32),
            jnp.asarray(f_min, jnp.float32), jnp.asarray(f_max, jnp.float32),
            jnp.asarray(f_start, jnp.float32),
            jnp.asarray(cycle_lengths, jnp.float32),
            jnp.asarray(cum, jnp.float32))


def warmup_cosine2(warm_up_steps: Sequence[int], f_min: Sequence[float],
                   f_max: Sequence[float], f_start: Sequence[float],
                   cycle_lengths: Sequence[int]) -> optax.Schedule:
    """LambdaWarmUpCosineScheduler2 (`ldm/lr_scheduler.py:59-76`): cycle =
    first interval with n <= cum_cycles[i+1]; within it, linear warm-up then
    cosine from f_max to f_min. Past the last cycle the final value holds
    (the reference would crash on find_in_interval=None; clamping is the
    useful extension)."""
    wu, fmn, fmx, fst, cl, cum = _cycle_arrays(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths)
    n_cycles = len(cycle_lengths)

    def fn(step):
        n0 = jnp.asarray(step, jnp.float32)
        # find_in_interval: first i with n <= cum[i+1]
        c = jnp.clip(jnp.searchsorted(cum[1:], n0, side="left"), 0, n_cycles - 1)
        n = jnp.minimum(n0 - cum[c], cl[c])
        warm = (fmx[c] - fst[c]) / wu[c] * n + fst[c]
        t = jnp.minimum((n - wu[c]) / (cl[c] - wu[c]), 1.0)
        decay = fmn[c] + 0.5 * (fmx[c] - fmn[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < wu[c], warm, decay)

    return fn


def lambda_linear(warm_up_steps: Sequence[int], f_min: Sequence[float],
                  f_max: Sequence[float], f_start: Sequence[float],
                  cycle_lengths: Sequence[int]) -> optax.Schedule:
    """LambdaLinearScheduler (`ldm/lr_scheduler.py:83-97`): linear warm-up,
    then linear decay f = f_min + (f_max-f_min)*(cycle_len - n)/cycle_len.
    The shipped configs use f_max=f_min=1 -> constant after warm-up."""
    wu, fmn, fmx, fst, cl, cum = _cycle_arrays(
        warm_up_steps, f_min, f_max, f_start, cycle_lengths)
    n_cycles = len(cycle_lengths)

    def fn(step):
        n0 = jnp.asarray(step, jnp.float32)
        c = jnp.clip(jnp.searchsorted(cum[1:], n0, side="left"), 0, n_cycles - 1)
        n = jnp.minimum(n0 - cum[c], cl[c])
        warm = (fmx[c] - fst[c]) / wu[c] * n + fst[c]
        decay = fmn[c] + (fmx[c] - fmn[c]) * (cl[c] - n) / cl[c]
        return jnp.where(n < wu[c], warm, decay)

    return fn


_REGISTRY = {
    "LambdaWarmUpCosineScheduler": warmup_cosine,
    "LambdaWarmUpCosineScheduler2": warmup_cosine2,
    "LambdaLinearScheduler": lambda_linear,
}

# reference YAML arg names -> python kwarg names (cosine-1 uses lr_*;
# the cycle variants use f_*; all shared here verbatim)
_VERY_LARGE = 10_000_000_000_000  # configs/audiolcm.yaml cycle_lengths


def build_schedule(scheduler_config: Optional[dict], base_lr: float,
                   default_warmup: int = 10000) -> optax.Schedule:
    """YAML scheduler_config block -> optax.Schedule emitting base_lr * f(n).

    None falls back to the shipped LambdaLinear single-cycle defaults
    (warm_up_steps=[default_warmup], f_start=1e-6, f_max=f_min=1 — the
    `configs/audiolcm.yaml:26-35` block)."""
    if not scheduler_config:
        mult = lambda_linear([default_warmup], [1.0], [1.0], [1.0e-6],
                             [_VERY_LARGE])
    else:
        target = str(scheduler_config.get("target", "")).rsplit(".", 1)[-1]
        if target not in _REGISTRY:
            raise ValueError(
                f"unknown lr scheduler target {scheduler_config.get('target')!r};"
                f" known: {sorted(_REGISTRY)}")
        params = dict(scheduler_config.get("params", {}))
        params.pop("verbosity_interval", None)  # print cadence, not math
        mult = _REGISTRY[target](**params)

    def fn(step):
        return base_lr * mult(step)

    return fn
