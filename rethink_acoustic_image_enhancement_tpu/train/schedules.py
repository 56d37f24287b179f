"""LR schedules — optax-style pure ``step -> lr`` functions.

Ports of Train/basicsr/models/lr_scheduler.py. Every shipped config uses
``CosineAnnealingRestartCyclicLR`` with per-period eta_min
(KDLAET.yml:95-99, KDLAES.yml:87-91), with an optional linear warmup
layered on top (base_model.py:183-205: during warmup the LR ramps
linearly up to the *initial* LR, overriding the scheduler).

All schedules are jnp-traceable so the LR can be computed inside the
compiled train step (no host round-trip per iteration).

The reference's ``setup_schedulers`` also dispatches two scheduler names
that don't exist (SURVEY.md §2.4); those are simply absent here — unknown
names fail at build time.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _period_index(step, cumulative):
    """Index of the first cumulative period >= step (lr_scheduler.py
    get_position_from_periods: step == boundary stays in the earlier
    period, matching the torch scheduler exactly)."""
    cum = jnp.asarray(cumulative)
    return jnp.sum(step > cum)  # step in (cum[i-1], cum[i]] -> i


def cosine_annealing_restart_cyclic(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_mins: Sequence[float] = (0,),
) -> Schedule:
    """lr_scheduler.py:186-233 (the one every shipped config uses)."""
    assert len(periods) == len(restart_weights) == len(eta_mins)
    cumulative = np.cumsum(periods)
    starts = np.concatenate([[0], cumulative[:-1]])

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.clip(_period_index(step, cumulative), 0, len(periods) - 1)
        w = jnp.asarray(restart_weights)[idx]
        start = jnp.asarray(starts)[idx]
        period = jnp.asarray(periods)[idx]
        eta = jnp.asarray(eta_mins)[idx]
        frac = (step - start) / period
        return eta + w * 0.5 * (base_lr - eta) * (1 + jnp.cos(jnp.pi * frac))

    return schedule


def cosine_annealing_restart(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_min: float = 0.0,
) -> Schedule:
    """lr_scheduler.py:136-184 (single eta_min)."""
    return cosine_annealing_restart_cyclic(
        base_lr, periods, restart_weights, [eta_min] * len(periods))


def multi_step_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1,),
) -> Schedule:
    """lr_scheduler.py:7-47. Stateless closed form: lr = base * weight(of
    last restart) * gamma^(#milestones passed since that restart)."""
    restarts = list(restarts)
    restart_weights = list(restart_weights)
    ms = np.asarray(sorted(milestones))
    rs = np.asarray(restarts)

    def schedule(step):
        step = jnp.asarray(step)
        # active restart = largest restart <= step
        ridx = jnp.clip(jnp.sum(step >= jnp.asarray(rs)) - 1, 0, len(restarts) - 1)
        weight = jnp.asarray(restart_weights)[ridx]
        rstart = jnp.asarray(rs)[ridx]
        n_ms = jnp.sum((jnp.asarray(ms) > rstart) & (jnp.asarray(ms) <= step))
        return base_lr * weight * gamma ** n_ms

    return schedule


def linear_lr(base_lr: float, total_iter: int) -> Schedule:
    """lr_scheduler.py:49-70."""
    def schedule(step):
        return base_lr * (1 - jnp.asarray(step) / total_iter)

    return schedule


def vibrate_lr(base_lr: float, total_iter: int) -> Schedule:
    """lr_scheduler.py:72-134: decaying triangular oscillation."""
    T = max(total_iter // 80, 1)
    Th = max(T // 2, 1)

    def schedule(step):
        step = jnp.asarray(step)
        process = step / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        t = step % T
        f2 = t / Th
        f2 = jnp.where(t >= Th, 2 - f2, f2)
        weight = f * f2
        weight = jnp.where(step < Th, jnp.maximum(weight, 0.1), weight)
        return base_lr * weight

    return schedule


def with_warmup(schedule: Schedule, base_lr: float, warmup_iter: int) -> Schedule:
    """Linear warmup override (base_model.py:183-205): for
    step < warmup_iter, lr = base_lr * step / warmup_iter."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        step = jnp.asarray(step)
        return jnp.where(step < warmup_iter,
                         base_lr * step / warmup_iter, schedule(step))

    return warmed


def build_schedule(base_lr: float, scheduler_opt: dict,
                   warmup_iter: int = -1) -> Schedule:
    """Build from a reference-style ``train.scheduler`` config dict."""
    opt = dict(scheduler_opt)
    kind = opt.pop("type")
    if kind == "CosineAnnealingRestartCyclicLR":
        s = cosine_annealing_restart_cyclic(
            base_lr, opt["periods"], opt.get("restart_weights", (1,)),
            opt.get("eta_mins", (0,)))
    elif kind == "CosineAnnealingRestartLR":
        s = cosine_annealing_restart(
            base_lr, opt["periods"], opt.get("restart_weights", (1,)),
            opt.get("eta_min", 0.0))
    elif kind == "MultiStepLR" or kind == "MultiStepRestartLR":
        s = multi_step_restart(
            base_lr, opt["milestones"], opt.get("gamma", 0.1),
            opt.get("restarts", (0,)), opt.get("restart_weights", (1,)))
    elif kind == "LinearLR":
        s = linear_lr(base_lr, opt["total_iter"])
    elif kind == "VibrateLR":
        s = vibrate_lr(base_lr, opt["total_iter"])
    elif kind == "TrueCosineAnnealingLR" or kind == "CosineAnnealingLR":
        t_max = opt.get("T_max", opt.get("total_iter"))
        eta = opt.get("eta_min", 0.0)

        def s(step):
            return eta + 0.5 * (base_lr - eta) * (
                1 + jnp.cos(jnp.pi * jnp.asarray(step) / t_max))
    else:
        raise KeyError(f"unknown scheduler type {kind!r}")
    return with_warmup(s, base_lr, warmup_iter)
