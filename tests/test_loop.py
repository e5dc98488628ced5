"""Invariants of the shared chunked-optimization driver (solver/loop.py):
the speculative pipeline must return exactly the state the sequential loop
would, never advancing past the stopping decision."""

import numpy as np

from gaussian_fluids_tpu.solver.loop import Patience, run_chunked


def _mk_dispatch(log):
    def dispatch(carry, n):
        log.append(("dispatch", carry, n))
        new = carry + n
        return new, f"aux{new}", float(new)
    return dispatch


def test_runs_full_budget_with_partial_tail():
    log = []
    seen = []

    def on_chunk(m, aux, n):
        seen.append((m, aux, n))
        return False

    carry, done = run_chunked(0, _mk_dispatch(log), 250, 100, on_chunk,
                              "projection")
    assert (carry, done) == (250, 250)
    # chunks of 100, 100, 50 were consumed in order
    assert [n for _, _, n in seen] == [100, 100, 50]
    assert [m for m, _, _ in seen] == [100.0, 200.0, 250.0]
    assert [a for _, a, _ in seen] == ["aux100", "aux200", "aux250"]


def test_early_stop_abandons_inflight_chunk():
    log = []

    def on_chunk(m, aux, n):
        return m >= 200.0   # stop once 200 epochs observed

    carry, done = run_chunked(0, _mk_dispatch(log), 1000, 100, on_chunk,
                              "clone")
    # stopped at 200 even though chunk 3 was speculatively dispatched
    assert (carry, done) == (200, 200)
    dispatched = [n for tag, _, n in log if tag == "dispatch"]
    assert len(dispatched) == 3   # the third chunk was in flight, unused


def test_zero_budget_is_a_noop():
    carry, done = run_chunked(42, _mk_dispatch([]), 0, 100,
                              lambda *a: False, "x")
    assert (carry, done) == (42, 0)


def test_non_finite_metrics_raise():
    # NaN never beats Patience.best, so without the guard a diverged phase
    # would "early stop" normally and the run would keep writing NaN
    # checkpoints; the driver must halt loudly instead
    import pytest

    def dispatch(carry, n):
        new = carry + n
        return new, None, (float(new), np.nan)

    with pytest.raises(FloatingPointError, match="clone"):
        run_chunked(0, dispatch, 1000, 100, lambda *a: False, "clone")


def test_patience_matches_reference_semantics():
    p = Patience(1e-3)
    p.update(1.0, 100)        # first value always improves vs inf
    assert p.iters == 0
    p.update(0.9995, 100)     # not a 1e-3 relative improvement
    assert p.iters == 100
    p.update(0.9995, 100)
    assert p.iters == 200
    p.update(0.5, 100)        # real improvement resets
    assert p.iters == 0 and p.best == 0.5
