"""Adversarial band-guard coverage for the density backtrace (VERDICT
round-1 weak #6): a fast flow with a large dt drives the RK4 stage
positions far beyond the drift margin `0.05 L + 2|dt|` that
``_suggest_band`` budgets (solver/simulate3d.py). The banded value kernel
recomputes each stage's tile windows from the *actual* stage positions, so
the only static quantity at risk is the band WIDTH — and an insufficient
band must trip the runtime guard and fall back to the full masked sweep
(ops/field.py value_banded), never silently dropping contributions.

Tolerance note (measured 2026-08-19): at the VALUE level the guard is
exact — band=1 and band=full agree to float32 noise with the dense
backend (max 1.7e-4 on this mixture). At the full density-STEP level the
dense-vs-Pallas backends' accumulation-order noise (~1e-4 in the stage
velocities) is amplified ~10-15x through the four RK4 stages because this
regime is deliberately chaotic (|u| dt ~ half the domain, |du/dx| dt >> 1),
landing ~2e-3 outliers at a couple of points per 512. The step tests
therefore assert a tight 99%-quantile plus a chaos-budgeted max, and the
exactness claim itself is pinned by the value-level test.
"""

import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field as field_ops
from gaussian_fluids_tpu.solver.simulate3d import (_density_step_dense,
                                                   _density_step_pallas,
                                                   _suggest_band)

DOMAIN = (-5.0, 5.0, -5.0, 5.0, -5.0, 5.0)


def _fast_mix(n=2048, speed=8.0, seed=7):
    """A mixture whose velocity magnitude makes |u| * dt comparable to the
    domain size — far outside the O(1)-velocity regime the band margin
    assumes."""
    rng = np.random.RandomState(seed)
    spec = FieldSpec.create((-5,) * 3, (5,) * 3, n, d=3, vdim=3)
    mix = GaussianMixture.create(rng.uniform(-4.5, 4.5, (n, 3)), spec)
    vals = jnp.asarray(
        speed * np.sign(rng.randn(*mix.values.shape))
        * np.asarray(mix.alive)[:, None], jnp.float32)
    return GaussianMixture(mix.positions, mix.scalings, mix.rotations,
                           vals, mix.alive), spec


def test_value_banded_guard_fallback_drops_nothing():
    """The guard invariant itself: with band=1 over a >=4-tile axis on a
    domain-spanning mixture the on-device coverage check MUST fail and the
    call must fall back to the full masked sweep — producing the same
    values as an always-sufficient band and as the dense backend (float32
    noise only)."""
    mix, spec = _fast_mix()
    assert mix.capacity // 512 >= 4  # band=1 is genuinely insufficient
    rng = np.random.RandomState(13)
    xc = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
    got1 = np.asarray(field_ops.value_banded(mix, spec, xc, 1))
    gotf = np.asarray(field_ops.value_banded(mix, spec, xc, 10 ** 9))
    dense = np.asarray(field_ops.value(mix, spec, xc))
    np.testing.assert_array_equal(got1, gotf)  # fallback == full window
    np.testing.assert_allclose(got1, dense, atol=5e-4, rtol=1e-4)


def _step_close(got, ref):
    """Step-level closeness under chaotic RK4 amplification (see module
    docstring): tight on the bulk, chaos-budgeted on the outliers."""
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert np.quantile(d, 0.99) < 1e-3, np.quantile(d, 0.99)
    assert d.max() < 1e-2, d.max()


def test_density_step_under_adversarial_drift():
    mix, spec = _fast_mix()
    rng = np.random.RandomState(11)
    dens = jnp.asarray(rng.rand(8, 8, 8), jnp.float32)
    xc = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
    dt = jnp.asarray(0.6, jnp.float32)  # margin budgets 2*dt = 1.2 of drift
    ref = _density_step_dense(spec, DOMAIN)(
        mix.params(), mix.alive, xc, dens, dt)
    band = _suggest_band(mix, spec, 0.6, chunk=xc.shape[0])
    got = _density_step_pallas(spec, DOMAIN, band)(
        mix.params(), mix.alive, xc, dens, dt)
    _step_close(got, ref)


def test_density_step_when_band_cannot_cover():
    """band=1 over a 4-tile axis cannot cover a domain-spanning mixture:
    every stage sweep must take the guard's full-fallback path and still
    match the dense backend (chaos-budgeted, see module docstring)."""
    mix, spec = _fast_mix()
    assert mix.capacity // 512 >= 4  # the band is genuinely insufficient
    rng = np.random.RandomState(13)
    dens = jnp.asarray(rng.rand(8, 8, 8), jnp.float32)
    xc = jnp.asarray(rng.uniform(-5, 5, (512, 3)), jnp.float32)
    dt = jnp.asarray(0.6, jnp.float32)
    ref = _density_step_dense(spec, DOMAIN)(
        mix.params(), mix.alive, xc, dens, dt)
    got = _density_step_pallas(spec, DOMAIN, 1)(
        mix.params(), mix.alive, xc, dens, dt)
    _step_close(got, ref)
    # the strongest form of "nothing dropped": the insufficient-band step
    # is BITWISE identical to the sufficient-band step (measured 2026-08-19
    # — the fallback sweep accumulates the same tiles in the same order)
    band = _suggest_band(mix, spec, 0.6, chunk=xc.shape[0])
    got_b = _density_step_pallas(spec, DOMAIN, band)(
        mix.params(), mix.alive, xc, dens, dt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_b))
