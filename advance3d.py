#!/usr/bin/env python
"""3D simulation entry point (reference: 3D/advance.py).

    python advance3d.py --init_cond leapfrog --dt .1 --last_time 2 --dir out3d
"""
from gaussian_fluids_tpu.cli import parse_args_3d
from gaussian_fluids_tpu.solver.simulate3d import advance_3d
from gaussian_fluids_tpu.utils.profiling import maybe_trace

if __name__ == "__main__":
    args = parse_args_3d(default_max_epoch=20000)
    with maybe_trace(args.profile):
        advance_3d(args.init_cond, args.dir, args.dt, args.last_time,
                   start_frame=args.start_frame, max_epoch=args.max_epoch,
                   boundary_lambda=args.boundary, seed=args.seed,
                   viz=not args.no_viz, target_grid_res=args.target_grid,
                   mesh_shape=args.mesh)
