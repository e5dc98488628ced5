"""Native C++ runtime components vs Python fallbacks."""

import numpy as np
import pytest

from gaussian_fluids_tpu.io import vti
from gaussian_fluids_tpu.utils import native


def test_native_builds():
    lib = native.load()
    assert lib is not None, "g++ build of native/gf_native.cpp failed"


def test_native_vti_roundtrip(tmp_path):
    v = np.random.RandomState(0).rand(6, 5, 4).astype(np.float32)
    path = str(tmp_path / "n.vti")
    ok = native.vti_write_f32(path, v, (0, 0, 0), (0.1, 0.2, 0.3))
    assert ok
    back = vti.read_vti_array(path)
    np.testing.assert_allclose(back, v)


def test_native_obj_parse_matches_python(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "vn 0 0 1\nvn 1 0 0\n"
        "f 1//1 2//1 3//2\nf 1//2 3//1 4//2\n")
    v, n, f, fn = native.parse_obj(str(obj))
    assert v.shape == (4, 3) and n.shape == (2, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(fn, [[0, 0, 1], [1, 0, 1]])


def test_blue_noise_spreads_points():
    pts = native.blue_noise_2d(64, seed=3, x_min=0, x_max=1, y_min=0,
                               y_max=1)
    assert pts.shape == (64, 2)
    assert (pts >= 0).all() and (pts <= 1).all()
    # blue noise: min pairwise distance far above random expectation
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert np.sqrt(d2.min()) > 0.03


def test_obj_quad_faces_fan_triangulated(tmp_path):
    """Quads must become two triangles in BOTH parsers (C++ and Python) —
    previously the second triangle was silently dropped."""
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1 4//1\n")
    from gaussian_fluids_tpu.scenes.mesh import MeshSampler
    import numpy as np

    # native path (if the toolchain is available) or Python fallback —
    # both go through MeshSampler
    ms = MeshSampler(str(obj), 1.0, np.eye(3, dtype=np.float32),
                     np.zeros(3, dtype=np.float32))
    assert ms.faces.shape == (2, 3)
    # total area of the unit quad
    np.testing.assert_allclose(float(ms.area_presum[-1]), 1.0, rtol=1e-6)

    from gaussian_fluids_tpu.utils import native
    if native.load() is not None:
        parsed = native.parse_obj(str(obj))
        assert parsed is not None and parsed[2].shape == (2, 3)


def test_obj_vertex_texcoord_faces_both_parsers(tmp_path, monkeypatch):
    """'f v/vt ...' faces (legal OBJ, no normal index) must NOT read the
    texcoord index as a normal index — both parsers fall back to the
    vertex index (previously the Python fallback used the last '/'-field,
    silently gathering normals at texcoord indices)."""
    obj = tmp_path / "vt.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "vt 0.9 0.9\nvt 0.8 0.8\nvt 0.7 0.7\n"
        "f 1/3 2/2 3/1\n")
    from gaussian_fluids_tpu.scenes.mesh import MeshSampler
    from gaussian_fluids_tpu.utils import native

    eye = np.eye(3, dtype=np.float32)
    zero = np.zeros(3, dtype=np.float32)
    expected_fn = [[0, 1, 2]]     # vertex-index fallback, NOT [[2, 1, 0]]

    ms = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms.facenormals, expected_fn)

    # force the pure-Python fallback even when the C++ parser is built
    monkeypatch.setattr(native, "parse_obj", lambda path: None)
    ms_py = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms_py.facenormals, expected_fn)
    np.testing.assert_array_equal(ms_py.faces, ms.faces)


def test_obj_negative_relative_indices_both_parsers(tmp_path, monkeypatch):
    """Negative OBJ face indices are relative to the elements defined so
    far ('f -3 -2 -1' after 3 vertices means vertices 1,2,3) — previously
    both parsers produced wrapped/out-of-range indices silently."""
    obj = tmp_path / "rel.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f -3//-3 -2//-2 -1//-1\n")
    from gaussian_fluids_tpu.scenes.mesh import MeshSampler
    from gaussian_fluids_tpu.utils import native

    eye = np.eye(3, dtype=np.float32)
    zero = np.zeros(3, dtype=np.float32)

    ms = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms.faces, [[0, 1, 2]])
    np.testing.assert_array_equal(ms.facenormals, [[0, 1, 2]])

    monkeypatch.setattr(native, "parse_obj", lambda path: None)
    ms_py = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms_py.faces, [[0, 1, 2]])
    np.testing.assert_array_equal(ms_py.facenormals, [[0, 1, 2]])


def test_obj_empty_normal_slot_both_parsers(tmp_path, monkeypatch):
    """'f v//' tokens (empty normal slot) must fall back to the vertex
    index in BOTH parsers — the C++ parser previously emitted index -1
    (strtol consumed nothing), diverging from the Python fallback."""
    obj = tmp_path / "vslash.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1// 2// 3//\n")
    from gaussian_fluids_tpu.scenes.mesh import MeshSampler
    from gaussian_fluids_tpu.utils import native

    eye = np.eye(3, dtype=np.float32)
    zero = np.zeros(3, dtype=np.float32)
    expected_fn = [[0, 1, 2]]

    ms = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms.facenormals, expected_fn)

    monkeypatch.setattr(native, "parse_obj", lambda path: None)
    ms_py = MeshSampler(str(obj), 1.0, eye, zero)
    np.testing.assert_array_equal(ms_py.facenormals, expected_fn)
