#!/usr/bin/env python
"""2D initial fitting entry point (reference: 2D/initialize.py).

    python initialize2d.py --init_cond leapfrog --dir out
"""
from gaussian_fluids_tpu.cli import parse_args_2d
from gaussian_fluids_tpu.solver.simulate2d import initialize_2d
from gaussian_fluids_tpu.utils.profiling import maybe_trace

if __name__ == "__main__":
    args = parse_args_2d(default_max_epoch=10000)
    with maybe_trace(args.profile):
        initialize_2d(args.init_cond, args.dir, max_epoch=args.max_epoch,
                      seed=args.seed, viz=not args.no_viz)
