"""VTK ImageData (.vti) writer — pure Python, no vtk dependency.

Produces the same artifact as the reference's vtk-based writer (reference
3D/GSR.py:728-742, 3D/advance_density.py:73-85): an XML ImageData file with
one Float32 point-data scalar array, Fortran-ordered (x fastest), inline
base64 ("binary" format with a UInt32 byte-count header), readable by
ParaView/VTK.
"""

from __future__ import annotations

import base64
import struct

import numpy as np


def write_vti_array(V: np.ndarray, origin, spacing, save_filename: str,
                    name: str = "scalars") -> None:
    """V: (nx, ny, nz) scalar volume. Uses the native C++ writer (appended
    raw encoding — fastest for the 512^3 smoke volumes) when available,
    else the pure-Python inline-base64 path."""
    from gaussian_fluids_tpu.utils import native
    V = np.ascontiguousarray(np.asarray(V, np.float32))
    if native.vti_write_f32(save_filename, V, origin, spacing, name):
        return
    nx, ny, nz = V.shape
    raw = V.ravel(order="F").tobytes()
    payload = base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()
    extent = f"0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"
    ox, oy, oz = origin
    sx, sy, sz = spacing
    with open(save_filename, "w") as fd:
        fd.write(
            '<?xml version="1.0"?>\n'
            '<VTKFile type="ImageData" version="0.1" '
            'byte_order="LittleEndian" header_type="UInt32">\n'
            f'  <ImageData WholeExtent="{extent}" '
            f'Origin="{ox} {oy} {oz}" Spacing="{sx} {sy} {sz}">\n'
            f'    <Piece Extent="{extent}">\n'
            f'      <PointData Scalars="{name}">\n'
            f'        <DataArray type="Float32" Name="{name}" '
            'format="binary">\n'
            f'          {payload}\n'
            '        </DataArray>\n'
            '      </PointData>\n'
            '      <CellData></CellData>\n'
            '    </Piece>\n'
            '  </ImageData>\n'
            '</VTKFile>\n')


def read_vti_array(path: str) -> np.ndarray:
    """Minimal reader for round-trip tests of files we wrote (both the
    inline-base64 and the native appended-raw encodings)."""
    import re
    with open(path, "rb") as fd:
        blob = fd.read()
    text = blob.decode("latin-1")
    extent = [int(t) for t in
              re.search(r'WholeExtent="([^"]+)"', text).group(1).split()]
    nx, ny, nz = extent[1] + 1, extent[3] + 1, extent[5] + 1
    m = re.search(r'format="binary">\s*([A-Za-z0-9+/=]+)\s*<', text)
    if m:
        raw = base64.b64decode(m.group(1))
    else:
        start = blob.index(b'encoding="raw">')
        start = blob.index(b"_", start) + 1
        raw = blob[start:]
    (nbytes,) = struct.unpack("<I", raw[:4])
    data = np.frombuffer(raw[4:4 + nbytes], np.float32)
    return data.reshape((nx, ny, nz), order="F")


def write_vti_field(field_fn, domain, save_filename: str,
                    x_n=30, y_n=30, z_n=30, chunk: int = 65536) -> None:
    """Evaluate a scalar field on the grid and write it (reference
    3D/GSR.py:728-742). field_fn: (B,3) -> (B,)."""
    from gaussian_fluids_tpu.utils.grids import grid_points_3d
    x_min, x_max, y_min, y_max, z_min, z_max = domain
    pts = grid_points_3d(x_min, x_max, y_min, y_max, z_min, z_max,
                         x_n, y_n, z_n)
    out = np.empty((pts.shape[0],), np.float32)
    for i in range(0, pts.shape[0], chunk):
        out[i:i + chunk] = np.asarray(field_fn(pts[i:i + chunk]))
    V = out.reshape(x_n, y_n, z_n)
    # spacing extent/n (not /(n-1)) over endpoint-inclusive sample grids
    # is the reference's convention verbatim (reference 3D/GSR.py:737:
    # SetSpacing((x_max - x_min) / x_N, ...)); kept for artifact parity
    # even though it renders the volume (n-1)/n-compressed toward origin.
    write_vti_array(
        V, (x_min, y_min, z_min),
        ((x_max - x_min) / x_n, (y_max - y_min) / y_n,
         (z_max - z_min) / z_n), save_filename)
