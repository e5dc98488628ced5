# Recipes mirroring the reference Justfile (3D leapfrog) plus 2D flows.

leapfrog3d-init:
	python initialize3d.py --init_cond leapfrog --dir output_3d

leapfrog3d dt="0.1" last="2":
	python advance3d.py --init_cond leapfrog --dir output_3d --dt {{dt}} --last_time {{last}}

leapfrog2d:
	python initialize2d.py --init_cond leapfrog --dir output_fast
	python advance2d.py --init_cond leapfrog --dir output_fast --dt .025 --last_time 40

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
