"""3D golden-frame determinism (round-2 follow-up to the 2D test in
test_numeric_parity.py): the 3D solver path has its own mechanisms the 2D
test never exercises — quaternion covariances, the split-until-none clone
loop (reference 3D/advance.py:62-87), the vorticity pullback + helicity
targets, and the fused 3D loss heads. Fixed-seed 2-frame leapfrog-3D runs
must produce bit-identical checkpoints when repeated (possible here
because gradient accumulation is deterministic XLA reductions; the
reference's Taichi atomic scatter could not guarantee this)."""

import os
import shutil

import torch

from gaussian_fluids_tpu.solver.simulate3d import advance_3d, initialize_3d


def test_golden_frame_determinism_3d(tmp_path, monkeypatch):
    monkeypatch.setenv("GF_FIELD_BACKEND", "dense")
    base = str(tmp_path / "init")
    initialize_3d("leapfrog", base, max_epoch=60, batch_size=256,
                  viz=False, particle_count=(4, 4, 4), verbose=0)
    dirs = [str(tmp_path / "a"), str(tmp_path / "b")]
    for d in dirs:
        shutil.copytree(base, d)
        advance_3d("leapfrog", d, dt=.05, last_time=.1, max_epoch=100,
                   batch_size=256, viz=False, verbose=0,
                   test_res=(6, 6, 6))
    for frame in (1, 2):
        a = torch.load(os.path.join(dirs[0], f"gaussian_velocity_{frame}.pt"),
                       map_location="cpu", weights_only=False)
        b = torch.load(os.path.join(dirs[1], f"gaussian_velocity_{frame}.pt"),
                       map_location="cpu", weights_only=False)
        for k in ("positions", "scalings", "rotations", "values"):
            assert torch.equal(a[k], b[k]), (frame, k)
