"""Shared chunked-optimization driver for the per-frame training phases.

Both projection (solver/project.py) and the clone re-fit (solver/clone.py)
run their epochs as jitted ``lax.scan`` chunks of ``check_iter`` epochs
with the reference's patience-based early stop evaluated between chunks
(reference 2D/advance.py:282-300). The host loop is identical in all three
call sites and encodes two subtle invariants, so it lives here once:

  * **Speculative chunk pipeline**: chunk k+1 is dispatched BEFORE chunk
    k's test metrics are fetched, so the device crunches the next chunk
    while the metric verdict's device->host round trip is in flight (that
    round trip costs ~a third of a 100-epoch chunk on remote-attached
    TPUs). On early stop the in-flight chunk is simply abandoned — the
    returned carry is identical to the sequential loop's.
  * The carry is only advanced to a chunk's result after that chunk's
    metrics are fetched, so the early-stopped state never includes epochs
    past the stopping decision.
"""

from __future__ import annotations

import numpy as np

import jax


class Patience:
    """Reference early-stop bookkeeping (2D/advance.py:288-300): reset on
    a relative improvement, otherwise accumulate epochs."""

    def __init__(self, rel):
        self.best, self.iters, self.rel = np.inf, 0, rel

    def update(self, value, check_iter):
        if value < self.best * (1.0 - self.rel):
            self.best, self.iters = value, 0
        else:
            self.iters += check_iter


def run_chunked(carry, dispatch, max_epoch: int, check_iter: int,
                on_chunk, tag: str):
    """Run up to ``max_epoch`` epochs in ``check_iter`` chunks.

    ``dispatch(carry, n) -> (new_carry, aux, metrics)`` launches one
    n-epoch chunk plus its (device-resident) test metrics.
    ``on_chunk(host_metrics, aux, n) -> bool`` is called once per fetched
    chunk (prints, patience updates); returning True stops early.
    Returns (carry, epochs_run)."""
    done = 0
    if max_epoch <= 0:
        return carry, 0
    cand_n = min(check_iter, max_epoch)
    cand, aux, m = dispatch(carry, cand_n)
    while True:
        nxt = None
        if done + cand_n < max_epoch:
            nxt_n = min(check_iter, max_epoch - done - cand_n)
            nxt, nxt_aux, nxt_m = dispatch(cand, nxt_n)
        mh = jax.device_get(m)
        done += cand_n
        carry = cand
        # a diverged phase must halt loudly: NaN never beats Patience.best,
        # so it would otherwise early-stop "normally" and the frame loop
        # would keep writing NaN checkpoints for the rest of a long run
        if not all(np.all(np.isfinite(leaf))
                   for leaf in jax.tree_util.tree_leaves(mh)):
            raise FloatingPointError(
                f"[{tag}] non-finite test metrics after {done} epochs: {mh}")
        if on_chunk(mh, aux, cand_n):
            print(f"[{tag}] Total epoch:", done)
            break
        if nxt is None:
            print(f"[{tag}] Total epoch:", max_epoch,
                  "(Reached maximum iteration number)")
            break
        cand, aux, m, cand_n = nxt, nxt_aux, nxt_m, nxt_n
    return carry, done
