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


def generate_icosphere(radius: float = 0.6,
                       center=(0.0, 0.95, 0.0),
                       subdivisions: int = 3):
    """Procedural substitute obstacle mesh. The reference scene needs
    ``assets/bunny.obj``, which is missing from the mount
    (.MISSING_LARGE_BLOBS); this icosphere matches the bunny's approximate
    pre-transform bounding volume so the transformed obstacle lands in the
    same region of the fluid domain. Returns (vertices, normals, faces)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    for _ in range(subdivisions):
        verts = list(verts)
        cache = {}

        def midpoint(i, j):
            keyk = (min(i, j), max(i, j))
            if keyk not in cache:
                m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2.0
                m /= np.linalg.norm(m)
                cache[keyk] = len(verts)
                verts.append(m)
            return cache[keyk]

        new_faces = []
        for (i, j, k) in faces:
            a, b, c = midpoint(i, j), midpoint(j, k), midpoint(k, i)
            new_faces += [(i, a, c), (j, b, a), (k, c, b), (a, b, c)]
        faces = new_faces
        verts = np.asarray(verts)
    verts = np.asarray(verts)
    normals = verts.copy()
    verts = verts * radius + np.asarray(center)
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
