"""Host-loop RNG helpers.

``jax.random.split`` called eagerly between jitted chunk launches is a
dispatch hazard on remote-attached TPUs: un-jitted, it traces to several
tiny eager executables, each paying a full host<->device round trip, which
serializes the otherwise-async chunk pipeline (measured ~45-100 ms per
loop iteration over a tunneled v5e — up to a third of a 100-epoch chunk at
2D scales). ``split2`` is the same operation as one cached jitted
executable, so it pipelines with the surrounding launches.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["split2", "split3"]


@functools.partial(jax.jit, static_argnames=("num",))
def _split(key, num: int = 2):
    return jax.random.split(key, num)


def split2(key):
    """(new_key, subkey) — drop-in for ``jax.random.split(key)`` in host
    loops; one jitted executable instead of an eager op chain."""
    k = _split(key)
    return k[0], k[1]


def split3(key):
    """(new_key, sub1, sub2) — jitted ``jax.random.split(key, 3)``."""
    k = _split(key, 3)
    return k[0], k[1], k[2]
