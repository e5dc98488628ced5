"""3D boundary samplers: area-weighted box faces and obstacle meshes
(reference 3D/init_cond.py:223-265)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_fluids_tpu.scenes import mesh as mesh_mod

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets")


def sample_on_box(key, n, domain):
    """Uniform-by-area samples on the six faces of a box, with inward
    normals (reference 3D/init_cond.py:227-249)."""
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    xs, ys, zs = x_max - x_min, y_max - y_min, z_max - z_min
    areas = jnp.asarray([ys * zs, ys * zs, zs * xs, zs * xs,
                         xs * ys, xs * ys], jnp.float32)
    k0, k1, k2 = jax.random.split(key, 3)
    t = jax.random.uniform(k0, (n,)) * areas.sum()
    face = jnp.searchsorted(jnp.cumsum(areas), t)
    u = jax.random.uniform(k1, (n,))
    v = jax.random.uniform(k2, (n,))
    # faces 0,1: y from u, z from v; faces 2,3: x from u, z from v;
    # faces 4,5: x from u, y from v
    ux = u * xs + x_min
    uy = u * ys + y_min
    vy = v * ys + y_min
    vz = v * zs + z_min
    px = jnp.where(face == 0, x_min, jnp.where(face == 1, x_max, ux))
    py = jnp.where(face <= 1, uy,
                   jnp.where(face == 2, y_min,
                             jnp.where(face == 3, y_max, vy)))
    pz = jnp.where(face <= 3, vz,
                   jnp.where(face == 4, z_min, z_max))
    normals = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    return jnp.stack([px, py, pz], -1), normals[face]


def load_obstacle_mesh(info):
    """Load the obstacle OBJ; if the reference's bunny.obj is absent
    (missing large blob), synthesize and cache a concave trefoil-tube
    substitute."""
    path = os.path.join(ASSET_DIR, info["obj_file"])
    if not os.path.exists(path):
        sub = os.path.join(ASSET_DIR, "bunny_substitute.obj")
        if not os.path.exists(sub):
            v, nn, f = mesh_mod.generate_trefoil_tube()
            mesh_mod.write_obj(sub, v, nn, f)
            print(f"[scenes3d] assets/{info['obj_file']} missing; generated "
                  f"concave trefoil-tube substitute at {sub}")
        path = sub
    rotate = np.eye(3, dtype=np.float32)
    return mesh_mod.MeshSampler(path, info["scale"], rotate,
                                info["translate"])


def make_sampler(name, domain, mesh_sampler):
    """(key, n) -> (points, normals); ring_with_obstacle concatenates box +
    mesh samples (reference 3D/init_cond.py:255-258) giving 2n points."""
    def box_sampler(key, n):
        return sample_on_box(key, n, domain)

    if mesh_sampler is None:
        return box_sampler

    def combined(key, n):
        k1, k2 = jax.random.split(key)
        d1, n1 = sample_on_box(k1, n, domain)
        d2, n2 = mesh_sampler.sample(k2, n)
        return jnp.concatenate([d1, d2]), jnp.concatenate([n1, n2])

    return combined
