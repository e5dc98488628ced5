"""Initial fitting: fit the Gaussian field to an analytic velocity field.

Replaces the reference's Python epoch loop `fit_velocity_with_gradient`
(reference 2D/initialize.py:10-41, 3D/initialize.py:9-46) with a jitted
``lax.scan`` over epochs, chunked by ``log_every`` so progress prints stay
host-side while each chunk runs as one XLA program (fit has no early stop
— the reference runs its full epoch budget, 2D/initialize.py:223-226).

Per epoch (identical math to the reference):
  * sample a fresh uniform batch in the (scaled) fit domain
  * losses: L1 value + L1 jacobian vs the analytic references, plus the
    anisotropy and volume-uniformity regularizers
  * one Adam step per param group; plateau schedulers step on the total
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.solver import losses, optim
from gaussian_fluids_tpu.utils import rng


def make_fit_epoch(spec: FieldSpec, ref_val_fn: Callable,
                   ref_jac_fn: Callable, lo, hi, batch_size: int):
    """Build the jitted scan body for one fit epoch."""
    d = spec.d
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)

    def loss_fn(params, alive, x, ref_val, ref_jac):
        mix = GaussianMixture(params["positions"], params["scalings"],
                              params["rotations"], params["values"], alive)
        val, jac = field.value_and_jac(mix, spec, x, presorted=True,
                                       need_dx=False)
        l_val = losses.value_loss(val, ref_val)
        l_grad = losses.grad_loss(jac, ref_jac)
        l_aniso = losses.aniso_loss(params["scalings"], alive)
        l_vol = losses.volume_loss(params["scalings"], alive)
        total = l_val + l_grad + l_aniso + l_vol
        div = losses.divergence(jac)
        aux = jnp.stack([l_val, l_grad, l_aniso, l_vol, (div ** 2).mean()])
        return total, aux

    def epoch(carry, key):
        params, opt_state, alive = carry
        x = jax.random.uniform(key, (batch_size, d), jnp.float32) \
            * (hi - lo) + lo
        if field._use_pallas(batch_size, params["positions"].shape[0]):
            x = x[jnp.argsort(x[:, 0])]   # sort once; evals run presorted
            # (dense backend ignores the hint — skip the pure-overhead sort)
        ref_val = ref_val_fn(x)
        ref_jac = ref_jac_fn(x)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, alive, x, ref_val, ref_jac)
        params, opt_state = optim.step(opt_state, params, grads, total)
        return (params, opt_state, alive), aux

    return epoch


def fit_velocity_with_gradient(mix: GaussianMixture, spec: FieldSpec,
                               ref_val_fn, ref_jac_fn, lo, hi,
                               lrs: Dict[str, float], batch_size: int,
                               max_epoch: int, key,
                               patience: int = 50, log_every: int = 100,
                               verbose: int = 1) -> GaussianMixture:
    epoch = make_fit_epoch(spec, ref_val_fn, ref_jac_fn, lo, hi, batch_size)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, key, n):
        keys = jax.random.split(key, n)
        return jax.lax.scan(epoch, carry, keys)

    params = mix.params()
    opt_state = optim.init(params, lrs, patience=patience)
    carry = (params, opt_state, mix.alive)

    st = time.time()
    done = 0
    pend = None   # previous chunk's aux; fetched AFTER dispatching the
    # next chunk so the device->host log round trip overlaps compute
    # (no decision depends on it — fit has no early stop)

    def flush(a_dev):
        a = jax.device_get(a_dev)
        nonlocal st
        print(f"loss: {a[0]:.6f}, loss_grad: {a[1]:.6f}, "
              f"loss_aniso: {a[2]:.6f}, loss_vol: {a[3]:.6f}, "
              f"divergence constraint: {a[4]:.6f}")
        print("time:", time.time() - st)
        st = time.time()

    while done < max_epoch:
        n = min(log_every, max_epoch - done)
        key, sub = rng.split2(key)
        carry, aux = run_chunk(carry, sub, n)
        done += n
        if verbose:
            if pend is not None:
                flush(pend)
            pend = aux[-1]
    if verbose and pend is not None:
        flush(pend)

    params, _, alive = carry
    return GaussianMixture(params["positions"], params["scalings"],
                           params["rotations"], params["values"], alive)
