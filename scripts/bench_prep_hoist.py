"""A/B: hoisting the constant-mixture kernel prep out of the covector
target's 5 val+jac evals (ring_collide scale N=64000, B=8192).

A: current path — covector.advected_vorticity_3d (each of the 5 RK4 evals
   reruns _centered_prep: packed precisions, padding, dilated tile bounds).
B: prepped — (muT, ppT, v_p, nlo, nhi) computed ONCE outside the scan;
   per-eval work is only the query-tile bbox + band intersect + kernel.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.ops import field
from gaussian_fluids_tpu.ops.pallas.gsr_centered import _fwd
from gaussian_fluids_tpu.solver import covector, losses
from gaussian_fluids_tpu.utils.profiling import hard_sync

N_SIDE, B = 40, 8192
TB, TN = 256, 512
xs = np.linspace(-5, 5, N_SIDE, dtype=np.float32)
pos = np.stack(np.meshgrid(xs, xs, xs, indexing="xy"), -1).reshape(-1, 3)
spec = FieldSpec.create((-5,) * 3, (5,) * 3, pos.shape[0], d=3, vdim=3)
mix = GaussianMixture.create(pos, spec)
rng = np.random.RandomState(0)
p = mix.params()
p["values"] = jnp.asarray(0.1 * rng.randn(*p["values"].shape).astype(np.float32))
mix = mix.with_params(p).spatially_sorted()
d, vdim = 3, 3
lo = jnp.asarray([-5.0] * 3)
hi = jnp.asarray([5.0] * 3)
dt = jnp.asarray(0.02, jnp.float32)


def prep_const():
    dead = ~field.in_domain_mask(mix, spec)
    pp = field._packed_precisions(mix, dead)
    mu_p = field._pad_axis(mix.positions, TN, axis=0)
    pp_p = field._pad_axis(pp, TN, axis=0)
    nb = d * (d + 1) // 2
    pp_p = pp_p.at[mix.capacity:, nb].set(1e9)
    v_p = field._pad_axis(mix.values, TN, axis=0)
    dead_n = field._pad_axis(dead.astype(jnp.float32), TN, axis=0,
                             fill=1.0) > 0.5
    s_p = field._pad_axis(mix.scalings, TN, axis=0)
    nnt = mu_p.shape[0] // TN
    rr = field.support_radius(s_p, spec.clamp_threshold).reshape(nnt, TN, 1)
    mun = mu_p.reshape(nnt, TN, d)
    dn = dead_n.reshape(nnt, TN, 1)
    nlo = jnp.min(jnp.where(dn, jnp.inf, mun - rr), axis=1)
    nhi = jnp.max(jnp.where(dn, -jnp.inf, mun + rr), axis=1)
    return mu_p.T, pp_p.T, v_p, nlo, nhi


def val_jac_prepped(cst, x):
    muT, ppT, v_p, nlo, nhi = cst
    b = x.shape[0]
    x_p = field._pad_axis(x, TB, axis=0)
    bp = x_p.shape[0]
    nbt = bp // TB
    xb = x_p.reshape(nbt, TB, d)
    vb = (jnp.arange(bp) < b).reshape(nbt, TB, 1)
    blo = jnp.min(jnp.where(vb, xb, jnp.inf), axis=1)
    bhi = jnp.max(jnp.where(vb, xb, -jnp.inf), axis=1)
    ok = jnp.all((bhi[:, None, :] >= nlo[None, :, :])
                 & (blo[:, None, :] <= nhi[None, :, :]), axis=-1)
    tmask = ok.astype(jnp.int32)
    out = _fwd(tmask, x_p, muT, ppT, v_p, d, vdim,
               float(spec.clamp_threshold), TB, TN, d)[:b]
    val = out[:, :vdim]
    jac = jnp.transpose(out[:, vdim:].reshape(b, d, vdim), (0, 2, 1))
    return val, jac


def covector_prepped(cst, x):
    f = lambda pnt: val_jac_prepped(cst, pnt)
    v, dv = f(x)
    phi1 = x + -dt * 0.5 * v
    v1, dv1 = f(phi1)
    phi2 = x + -dt * 0.5 * v1
    v2, dv2 = f(phi2)
    phi3 = x + -dt * v2
    v3, dv3 = f(phi3)
    phi = x + -dt / 6.0 * (v + 2.0 * v1 + 2.0 * v2 + v3)
    eye = jnp.eye(d, dtype=x.dtype)[None]
    mm = lambda a, b2: jnp.einsum("bij,bjk->bik", a, b2)
    dphi1 = eye + -dt * 0.5 * dv
    dv1x = mm(dv1, dphi1)
    dphi2 = eye + -dt * 0.5 * dv1x
    dv2x = mm(dv2, dphi2)
    dphi3 = eye + -dt * dv2x
    dphi = eye + -dt / 6.0 * (dv + 2.0 * dv1x + 2.0 * dv2x + mm(dv3, dphi3))
    v_phi, dv_phi = f(phi)
    pb_vor = losses.curl3d(dv_phi)
    hel = jnp.sum(v_phi * pb_vor, axis=-1)
    vor = jnp.linalg.solve(dphi, pb_vor[..., None])[..., 0]
    return vor, hel


@jax.jit
def run_a(carry, key):
    def body(c, k):
        data = jax.random.uniform(k, (B, 3), jnp.float32) * (hi - lo) + lo
        data = data[jnp.argsort(data[:, 0])]
        vor, hel = covector.advected_vorticity_3d(mix, spec, data, dt,
                                                  presorted=True)
        return c + vor.sum() + hel.sum(), None
    return jax.lax.scan(body, carry, jax.random.split(key, 20))[0]


@jax.jit
def run_b(carry, key):
    cst = prep_const()
    def body(c, k):
        data = jax.random.uniform(k, (B, 3), jnp.float32) * (hi - lo) + lo
        data = data[jnp.argsort(data[:, 0])]
        vor, hel = covector_prepped(cst, data)
        return c + vor.sum() + hel.sum(), None
    return jax.lax.scan(body, carry, jax.random.split(key, 20))[0]


def timeit(label, f):
    key = jax.random.PRNGKey(0)
    out = f(jnp.zeros(()), key)
    float(out)
    t0 = time.perf_counter()
    out = f(jnp.zeros(()), key)
    float(out)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{label:24s} {ms:8.2f} ms/epoch-equivalent")


# numerical agreement check first
key = jax.random.PRNGKey(7)
data = jax.random.uniform(key, (B, 3), jnp.float32) * (hi - lo) + lo
data = data[jnp.argsort(data[:, 0])]
va, ha = covector.advected_vorticity_3d(mix, spec, data, dt, presorted=True)
vb2, hb2 = jax.jit(lambda x: covector_prepped(prep_const(), x))(data)
print("max |dvor|", float(jnp.max(jnp.abs(va - vb2))),
      " max |dhel|", float(jnp.max(jnp.abs(ha - hb2))))

timeit("A current (per-eval prep)", run_a)
timeit("B hoisted prep", run_b)
