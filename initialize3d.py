#!/usr/bin/env python
"""3D initial fitting entry point (reference: 3D/initialize.py).

    python initialize3d.py --init_cond leapfrog --dir out3d
"""
from gaussian_fluids_tpu.cli import parse_args_3d
from gaussian_fluids_tpu.solver.simulate3d import initialize_3d
from gaussian_fluids_tpu.utils.profiling import maybe_trace

if __name__ == "__main__":
    args = parse_args_3d(default_max_epoch=500)
    with maybe_trace(args.profile):
        initialize_3d(args.init_cond, args.dir, max_epoch=args.max_epoch,
                      seed=args.seed, viz=not args.no_viz)
