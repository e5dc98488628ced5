"""Optimizer: four independent Adam groups, each with a
reduce-on-plateau LR schedule — fully jittable state.

Mirrors the reference's optimizer block (reference 2D/GSR.py:50-71,165-169;
3D/GSR.py:50-71): one Adam per parameter group (positions, scalings,
rotations, values) and one ``ReduceLROnPlateau(factor=.9, patience=p)``
each, stepped on the *training* total loss every epoch.

Semantics match torch defaults: Adam(betas=(0.9, 0.999), eps=1e-8);
plateau mode='min', threshold=1e-4 (relative), cooldown=0, min_lr=0:
improvement iff metric < best * (1 - 1e-4); after more than `patience`
consecutive non-improving steps, lr *= factor and the counter resets.

Everything is a pytree of scalars/arrays so the whole training epoch runs
inside ``lax.scan`` (the TPU replacement for the reference's Python epoch
loop).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

BETA1, BETA2, EPS = 0.9, 0.999, 1e-8
PLATEAU_THRESHOLD = 1e-4
PLATEAU_FACTOR = 0.9


class GroupState(NamedTuple):
    lr: jnp.ndarray        # () f32 — current learning rate
    step: jnp.ndarray      # () i32 — Adam timestep
    m: jnp.ndarray         # first moment
    v: jnp.ndarray         # second moment
    best: jnp.ndarray      # () f32 — plateau best metric
    num_bad: jnp.ndarray   # () i32 — consecutive non-improving epochs


class OptState(NamedTuple):
    groups: Dict[str, GroupState]
    patience: jnp.ndarray  # () i32


def init(params: Params, lrs: Dict[str, float], patience: int = 50) -> OptState:
    groups = {}
    for k, p in params.items():
        groups[k] = GroupState(
            lr=jnp.asarray(lrs[k], jnp.float32),
            step=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(p),
            v=jnp.zeros_like(p),
            best=jnp.asarray(jnp.inf, jnp.float32),
            num_bad=jnp.zeros((), jnp.int32),
        )
    return OptState(groups=groups, patience=jnp.asarray(patience, jnp.int32))


def _adam_group(g: GroupState, p: jnp.ndarray, grad: jnp.ndarray):
    t = g.step + 1
    m = BETA1 * g.m + (1.0 - BETA1) * grad
    v = BETA2 * g.v + (1.0 - BETA2) * grad * grad
    mhat = m / (1.0 - BETA1 ** t.astype(jnp.float32))
    vhat = v / (1.0 - BETA2 ** t.astype(jnp.float32))
    p_new = p - g.lr * mhat / (jnp.sqrt(vhat) + EPS)
    return p_new, g._replace(step=t, m=m, v=v)


def _plateau_group(g: GroupState, metric: jnp.ndarray,
                   patience: jnp.ndarray) -> GroupState:
    improved = metric < g.best * (1.0 - PLATEAU_THRESHOLD)
    best = jnp.where(improved, metric, g.best)
    num_bad = jnp.where(improved, 0, g.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, g.lr * PLATEAU_FACTOR, g.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return g._replace(lr=lr, best=best, num_bad=num_bad)


def step(state: OptState, params: Params, grads: Params,
         metric: jnp.ndarray):
    """One `optimizer.step() + scheduler.step(metric)` over all four groups
    (reference 2D/GSR.py:165-169)."""
    new_params, new_groups = {}, {}
    for k in params:
        p_new, g_new = _adam_group(state.groups[k], params[k], grads[k])
        g_new = _plateau_group(g_new, metric, state.patience)
        new_params[k] = p_new
        new_groups[k] = g_new
    return new_params, OptState(groups=new_groups, patience=state.patience)


def get_lrs(state: OptState) -> Dict[str, jnp.ndarray]:
    return {k: g.lr for k, g in state.groups.items()}
