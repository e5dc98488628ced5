"""Checkpoint I/O — preserves the reference's ``gaussian_velocity_{n}.pt``
format exactly (SURVEY.md §2.7): a torch-pickled dict of the four parameter
tensors plus ``clamp_threshold``, ``min_grid_scale`` and ``domain_range``
(padded bounds, interleaved (x_min, x_max, y_min, y_max[, z_min, z_max]) —
reference 2D/GSR.py:231-240, 3D/GSR.py:179-188).

torch (CPU build) is used only here, purely as a serialization library; if
it is unavailable we fall back to a ``.npz`` sidecar with the same keys.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gaussian_fluids_tpu.config import FieldSpec
from gaussian_fluids_tpu.models.mixture import GaussianMixture

try:
    import torch
    _HAVE_TORCH = True
except Exception:  # pragma: no cover
    _HAVE_TORCH = False


def _domain_range(spec: FieldSpec):
    out = []
    for a, b in zip(spec.lo, spec.hi):
        out.extend([float(a), float(b)])
    return tuple(out)


def save_checkpoint(path: str, mix: GaussianMixture, spec: FieldSpec) -> None:
    import os

    params = mix.to_param_dict()
    payload = {
        "clamp_threshold": spec.clamp_threshold,
        "min_grid_scale": spec.min_grid_scale,
        "domain_range": _domain_range(spec),
    }
    # Write-to-tmp + fsync + atomic rename: the production chain may be
    # SIGTERM'd mid-frame (bench.py preemption) or the HOST may restart
    # uncleanly (it has, twice), and the resume logic loads the
    # HIGHEST-numbered checkpoint — a torn final write would brick the
    # whole run directory. Without the fsync the rename can be journaled
    # before the file data, leaving a truncated visible file after a hard
    # restart (ADVICE r2); fsync-before-rename (+ directory fsync so the
    # rename itself is durable) closes that window.
    if _HAVE_TORCH:
        payload = {k: torch.from_numpy(np.array(v, copy=True))
                   for k, v in params.items()} | payload
        tmp = path + ".tmp"
        with open(tmp, "wb") as fd:
            torch.save(payload, fd)
            fd.flush()
            os.fsync(fd.fileno())
        os.replace(tmp, path)
        final = path
    else:  # pragma: no cover
        tmp = path + ".npz.tmp"
        with open(tmp, "wb") as fd:
            np.savez(fd, **params,
                     clamp_threshold=spec.clamp_threshold,
                     min_grid_scale=spec.min_grid_scale,
                     domain_range=np.asarray(payload["domain_range"]))
            fd.flush()
            os.fsync(fd.fileno())
        os.replace(tmp, path + ".npz")
        final = path + ".npz"
    dirfd = os.open(os.path.dirname(os.path.abspath(final)) or ".",
                    os.O_RDONLY)
    try:
        os.fsync(dirfd)
    finally:
        os.close(dirfd)


def _load_npz(path: str):
    data = np.load(path + ".npz")
    get = lambda k: np.asarray(data[k], np.float32)
    dr = tuple(float(v) for v in data["domain_range"])
    clamp = float(data["clamp_threshold"])
    mgs = float(data["min_grid_scale"])
    return get, dr, clamp, mgs


def load_checkpoint(path: str) -> Tuple[GaussianMixture, FieldSpec]:
    import os

    # Probe what actually exists rather than assuming the save-side
    # environment: a torch-pickle .pt from a torch-equipped trainer must
    # load on a torch-less replayer's .npz fallback path and vice versa.
    if _HAVE_TORCH and not os.path.exists(path) \
            and os.path.exists(path + ".npz"):
        get, dr, clamp, mgs = _load_npz(path)
    elif not _HAVE_TORCH and not os.path.exists(path + ".npz") \
            and os.path.exists(path):  # pragma: no cover
        raise RuntimeError(
            f"{path} is a torch-pickle checkpoint but torch is not "
            f"available in this environment")
    elif _HAVE_TORCH:
        data = torch.load(path, map_location="cpu", weights_only=False)
        get = lambda k: np.asarray(data[k].detach().cpu().numpy()
                                   if hasattr(data[k], "detach")
                                   else data[k], np.float32)
        dr = data["domain_range"]
        clamp = float(data["clamp_threshold"])
        mgs = float(data["min_grid_scale"])
    else:  # pragma: no cover
        get, dr, clamp, mgs = _load_npz(path)
    positions = get("positions")
    d = positions.shape[1]
    values = get("values")
    lo = tuple(float(dr[2 * i]) for i in range(d))
    hi = tuple(float(dr[2 * i + 1]) for i in range(d))
    spec = FieldSpec(d=d, vdim=values.shape[1], clamp_threshold=clamp,
                     min_grid_scale=mgs, lo=lo, hi=hi)
    # sort by coordinate 0 so the block-sparse field backend starts with
    # tight tile bounding boxes (Gaussian order is semantically irrelevant)
    mix = GaussianMixture.from_arrays(positions, get("scalings"),
                                      get("rotations"), values,
                                      spec).spatially_sorted()
    return mix, spec
