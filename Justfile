# Recipes mirroring the reference Justfile (3D leapfrog) plus every
# production config from the reference README run commands
# (reference README.md:45-117; per-scene dt/last_time from there).

leapfrog3d-init:
	python initialize3d.py --init_cond leapfrog --dir output_3d

leapfrog3d dt="0.1" last="2":
	python advance3d.py --init_cond leapfrog --dir output_3d --dt {{dt}} --last_time {{last}}

# --- 2D flows (reference README.md:45-95) ---

taylor-green2d:
	python initialize2d.py --init_cond taylor_green --dir output_tg
	python advance2d.py --init_cond taylor_green --dir output_tg --dt .001 --last_time .2

taylor-vortex2d:
	python initialize2d.py --init_cond taylor_vortex --dir output_tv
	python advance2d.py --init_cond taylor_vortex --dir output_tv --dt .01 --last_time 4

leapfrog2d:
	python initialize2d.py --init_cond leapfrog --dir output_fast
	python advance2d.py --init_cond leapfrog --dir output_fast --dt .025 --last_time 40

vortices-pass2d scene="vortices_pass":
	python initialize2d.py --init_cond {{scene}} --dir output_{{scene}}
	python advance2d.py --init_cond {{scene}} --dir output_{{scene}} --dt .01 --last_time 5

karman2d:
	python initialize2d.py --init_cond karman --dir output_karman
	python advance2d.py --init_cond karman --dir output_karman --dt .05 --last_time 10

# --- 3D flows (reference README.md:97-117) ---

ring-collide3d last="2":
	python initialize3d.py --init_cond ring_collide --dir output_3d_ring_collide
	python advance3d.py --init_cond ring_collide --dir output_3d_ring_collide --last_time {{last}}

# the recorded production configuration (BASELINE.md round-5 full-horizon
# A/B: div residual strictly better, morphology within 0.007, 3.2x faster
# frames); drop --target_grid for the exact reference-semantics mode
ring-collide3d-production last="2":
	python initialize3d.py --init_cond ring_collide --dir output_3d_ring_collide
	python advance3d.py --init_cond ring_collide --dir output_3d_ring_collide --last_time {{last}} --target_grid 128

ring-obstacle3d last="2":
	python initialize3d.py --init_cond ring_with_obstacle --dir output_3d_ring_with_obstacle
	python advance3d.py --init_cond ring_with_obstacle --dir output_3d_ring_with_obstacle --last_time {{last}}

# offline smoke volumes from saved ring_collide velocity checkpoints
density3d:
	python advance_density3d.py --init_cond ring_collide --dir output_3d_ring_collide

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
