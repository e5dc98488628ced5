#!/usr/bin/env python
"""Offline smoke-density rendering (reference: 3D/advance_density.py).

    python advance_density3d.py --init_cond ring_collide --dt .02 --dir out3d
"""
from gaussian_fluids_tpu.cli import parse_args_3d
from gaussian_fluids_tpu.solver.simulate3d import advance_density
from gaussian_fluids_tpu.utils.profiling import maybe_trace

if __name__ == "__main__":
    args = parse_args_3d()
    with maybe_trace(args.profile):
        advance_density(args.init_cond, args.dir, args.dt,
                        res_multiplier=args.density_res_multiplier,
                        mesh_shape=args.mesh,
                        start_frame=args.start_frame)
