"""OBJ mesh loading and area-weighted surface sampling.

Replaces the reference's Taichi mesh sampler (reference
3D/mesh_sampler.py:7-94): parse v/vn/f (with ``//`` indices), apply
scale-rotate-translate, build a per-face area prefix sum, then sample points
uniformly by area with the sqrt barycentric trick and interpolated normals.
The sampling path is pure jnp (vectorized searchsorted + gathers), keyed by
a JAX PRNG key instead of Taichi's unseeded ``ti.random()``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


class MeshSampler:
    def __init__(self, obj_file: str, scale, rotate, translate):
        self.load_obj(obj_file, scale, np.asarray(rotate, np.float32),
                      np.asarray(translate, np.float32))

    def load_obj(self, obj_file, scale, rotate, translate):
        from gaussian_fluids_tpu.utils import native
        parsed = native.parse_obj(obj_file)
        if parsed is not None:
            v, n_arr, f_arr, fn_arr = parsed
            vertices = v
            normals = list(n_arr)
            self.faces = f_arr
            self.facenormals = fn_arr
        else:  # pure-Python fallback
            vertices, normals, faces, facenormals = [], [], [], []
            with open(obj_file) as fd:
                for line in fd:
                    if line.startswith("v "):
                        vertices.append(
                            [float(t) for t in line.split()[1:4]])
                    elif line.startswith("vn "):
                        normals.append([float(t) for t in line.split()[1:4]])
                    elif line.startswith("f "):
                        toks = line.split()[1:]
                        # OBJ indices are 1-based; negative values are
                        # relative to the elements defined so far
                        res_v = lambda i: i - 1 if i > 0 else len(vertices) + i
                        res_n = lambda i: i - 1 if i > 0 else len(normals) + i
                        vs, ns = [], []
                        for t in toks:
                            parts = t.split("/")
                            vs.append(res_v(int(parts[0])))
                            # normal index only comes from the third
                            # field ('v//vn' or 'v/vt/vn'); 'v/vt', 'v//'
                            # and bare 'v' fall back to the vertex index
                            # (matches parse_obj in native/gf_native.cpp)
                            if len(parts) >= 3 and parts[2]:
                                ns.append(res_n(int(parts[2])))
                            else:
                                ns.append(vs[-1])
                        # fan-triangulate quads/n-gons (matches the C++
                        # parser; a quad would otherwise silently lose its
                        # second triangle)
                        for t in range(2, len(vs)):
                            faces.append([vs[0], vs[t - 1], vs[t]])
                            facenormals.append([ns[0], ns[t - 1], ns[t]])
            self.faces = np.asarray(faces, np.int32)
            self.facenormals = np.asarray(facenormals, np.int32)
        v = np.asarray(vertices, np.float32)
        self.vertices = (scale * v) @ rotate.T + translate
        if len(normals):
            n = np.asarray(normals, np.float32) @ rotate.T
            self.normals = n / np.linalg.norm(n, axis=-1, keepdims=True)
        else:
            self.normals = np.zeros((0, 3), np.float32)

        a = self.vertices[self.faces[:, 0]]
        b = self.vertices[self.faces[:, 1]]
        c = self.vertices[self.faces[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
        self.area_presum = np.cumsum(area).astype(np.float32)

        lo, hi = self.vertices.min(0), self.vertices.max(0)
        print(f"Bounding box: [{lo[0]}, {hi[0]}] x [{lo[1]}, {hi[1]}] x "
              f"[{lo[2]}, {hi[2]}]")
        print(f"Center: ({(lo[0]+hi[0])*.5}, {(lo[1]+hi[1])*.5}, "
              f"{(lo[2]+hi[2])*.5})")

        # device copies for the jnp sampling path
        self._v = jnp.asarray(self.vertices)
        self._n = jnp.asarray(self.normals) if len(self.normals) else None
        self._f = jnp.asarray(self.faces)
        self._fn = jnp.asarray(self.facenormals)
        self._presum = jnp.asarray(self.area_presum)

    def save_obj(self, obj_file: str):
        with open(obj_file, "w") as fd:
            for v in self.vertices:
                fd.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for n in self.normals:
                fd.write(f"vn {n[0]} {n[1]} {n[2]}\n")
            for f, fn in zip(self.faces, self.facenormals):
                fd.write(f"f {f[0]+1}//{fn[0]+1} {f[1]+1}//{fn[1]+1} "
                         f"{f[2]+1}//{fn[2]+1}\n")

    def sample(self, key, n: int):
        """(points (n,3), normals (n,3)) uniformly by area (reference
        3D/mesh_sampler.py:71-94)."""
        k1, k2, k3 = jax.random.split(key, 3)
        total = self._presum[-1]
        t = jax.random.uniform(k1, (n,)) * total
        fid = jnp.clip(jnp.searchsorted(self._presum, t),
                       0, self._f.shape[0] - 1)
        u = 1.0 - jnp.sqrt(jax.random.uniform(k2, (n,)))
        v = jax.random.uniform(k3, (n,)) * (1.0 - u)
        w = 1.0 - u - v
        tri = self._f[fid]                       # (n, 3)
        a = self._v[tri[:, 0]]
        b = self._v[tri[:, 1]]
        c = self._v[tri[:, 2]]
        p = u[:, None] * a + v[:, None] * b + w[:, None] * c
        if self._n is not None and self._n.shape[0] > 0:
            trin = self._fn[fid]
            na = self._n[trin[:, 0]]
            nb = self._n[trin[:, 1]]
            nc = self._n[trin[:, 2]]
            nrm = u[:, None] * na + v[:, None] * nb + w[:, None] * nc
        else:
            nrm = jnp.cross(b - a, c - a)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        return p, nrm


def generate_trefoil_tube(extent: float = 0.6,
                          center=(0.0, 0.95, 0.0),
                          tube_ratio: float = 0.30,
                          n_u: int = 240, n_v: int = 20):
    """Procedural substitute obstacle mesh. The reference scene needs
    ``assets/bunny.obj``, which is missing from the mount
    (.MISSING_LARGE_BLOBS); this trefoil-knot tube fits the bunny's
    approximate pre-transform bounding sphere so the transformed obstacle
    lands in the same region of the fluid domain.

    A trefoil was chosen over the round-2 icosphere deliberately: it is
    NON-convex (genus 1, three interleaved lobes, concave inner faces), so
    the mesh-flux machinery — interpolated vertex normals, area-weighted
    face sampling, the analyzer's |u.n| obstacle probe — is exercised
    where a convex sphere provably cannot fail. Normals are analytic (the
    tube's radial direction); frames are rotation-minimizing with the
    closure holonomy distributed as a linear twist so the mesh is
    watertight. Returns (vertices, normals, faces)."""
    t = np.linspace(0.0, 2.0 * np.pi, n_u, endpoint=False)
    # (2,3) trefoil curve and its analytic tangent
    c = np.stack([np.sin(t) + 2.0 * np.sin(2.0 * t),
                  np.cos(t) - 2.0 * np.cos(2.0 * t),
                  -np.sin(3.0 * t)], axis=-1)
    dc = np.stack([np.cos(t) + 4.0 * np.cos(2.0 * t),
                   -np.sin(t) + 4.0 * np.sin(2.0 * t),
                   -3.0 * np.cos(3.0 * t)], axis=-1)
    tan = dc / np.linalg.norm(dc, axis=-1, keepdims=True)
    # rotation-minimizing frame by projection transport
    n0 = np.asarray([0.0, 0.0, 1.0])
    n0 = n0 - np.dot(n0, tan[0]) * tan[0]
    frames_n = [n0 / np.linalg.norm(n0)]
    for i in range(1, n_u):
        n_prev = frames_n[-1]
        n_i = n_prev - np.dot(n_prev, tan[i]) * tan[i]
        frames_n.append(n_i / np.linalg.norm(n_i))
    nrm = np.asarray(frames_n)
    binrm = np.cross(tan, nrm)
    # closure holonomy: transporting once around leaves the frame rotated
    # by phi relative to the start; unwind it linearly so ring n_u-1
    # connects smoothly back to ring 0
    n_end = nrm[-1] - np.dot(nrm[-1], tan[0]) * tan[0]
    n_end /= np.linalg.norm(n_end)
    phi = np.arctan2(np.dot(np.cross(nrm[0], n_end), tan[0]),
                     np.dot(nrm[0], n_end))
    theta_corr = -phi * np.arange(n_u) / n_u
    cc, ss = np.cos(theta_corr)[:, None], np.sin(theta_corr)[:, None]
    nrm, binrm = cc * nrm + ss * binrm, -ss * nrm + cc * binrm

    r_curve = np.linalg.norm(c, axis=-1).max()
    tube_r = tube_ratio * extent
    scale = (extent - tube_r) / r_curve
    theta = np.linspace(0.0, 2.0 * np.pi, n_v, endpoint=False)
    radial = (np.cos(theta)[None, :, None] * nrm[:, None, :]
              + np.sin(theta)[None, :, None] * binrm[:, None, :])
    verts = (scale * c[:, None, :] + tube_r * radial
             + np.asarray(center)).reshape(-1, 3)
    normals = radial.reshape(-1, 3)

    def vid(i, j):
        return (i % n_u) * n_v + (j % n_v)

    faces = []
    for i in range(n_u):
        for j in range(n_v):
            a, b = vid(i, j), vid(i + 1, j)
            cq, d = vid(i + 1, j + 1), vid(i, j + 1)
            faces += [(a, cq, b), (a, d, cq)]
    return (verts.astype(np.float32), normals.astype(np.float32),
            np.asarray(faces, np.int32))


def write_obj(path, vertices, normals, faces):
    with open(path, "w") as fd:
        for v in vertices:
            fd.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for n in normals:
            fd.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        for f in faces:
            fd.write(f"f {f[0]+1}//{f[0]+1} {f[1]+1}//{f[1]+1} "
                     f"{f[2]+1}//{f[2]+1}\n")


def write_centers_obj(mix, path: str) -> None:
    """Dump the alive Gaussian centres as OBJ ``v`` lines — the
    reference's point-cloud debug dump (3D/GSR.py:743-748; defined there
    but uncalled). Works for 2D mixtures too (z = 0)."""
    pos = np.asarray(mix.positions)[np.asarray(mix.alive)]
    if pos.shape[1] == 2:
        pos = np.concatenate([pos, np.zeros((len(pos), 1), pos.dtype)], 1)
    with open(path, "w") as fd:
        for p in pos:
            fd.write(f"v {p[0]} {p[1]} {p[2]}\n")
