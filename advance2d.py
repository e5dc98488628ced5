#!/usr/bin/env python
"""2D simulation entry point (reference: 2D/advance.py).

    python advance2d.py --init_cond leapfrog --dt .025 --last_time 40 --dir out
"""
from gaussian_fluids_tpu.cli import parse_args_2d
from gaussian_fluids_tpu.solver.simulate2d import advance_2d
from gaussian_fluids_tpu.utils.profiling import maybe_trace

if __name__ == "__main__":
    args = parse_args_2d(default_max_epoch=20000)
    with maybe_trace(args.profile):
        advance_2d(args.init_cond, args.dir, args.dt, args.last_time,
                   start_frame=args.start_frame, max_epoch=args.max_epoch,
                   seed=args.seed, viz=not args.no_viz,
                   target_grid_res=args.target_grid,
                   mesh_shape=args.mesh)
