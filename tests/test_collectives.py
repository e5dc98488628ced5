"""Communication-volume regression guard (VERDICT r2 item 4): the number
of collectives the partitioner inserts per sharded projection epoch must
not grow. Measured on the 8-way virtual mesh by
scripts/bench_mesh_scaling.py (runs_r2_evidence/mesh_scaling.json); these
tests pin the per-epoch collective count of the compiled one-epoch chunk
on a 4x2 (batch x gauss) mesh."""

import jax
import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.parallel import driver, sharding
from gaussian_fluids_tpu.solver import optim
from gaussian_fluids_tpu.solver.project import ProjectWeights

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from bench_mesh_scaling import audit_collectives  # noqa: E402


def test_projection_2d_collective_count():
    from gaussian_fluids_tpu.scenes import get_scene_2d
    scene = get_scene_2d("leapfrog")
    sf = scene.scaling_factor
    adv = np.asarray(scene.advance_domain, np.float32)
    lo = np.asarray([adv[0], adv[2]]) * sf
    hi = np.asarray([adv[1], adv[3]]) * sf
    n = 128
    spec = FieldSpec.create(tuple(lo), tuple(hi), n, d=2, vdim=2)
    mk = lambda s: GaussianMixture.create(
        np.random.RandomState(s).uniform(lo * 0.9, hi * 0.9, (n, 2)), spec,
        pad=False)
    mix, old = mk(1), mk(2)
    mesh = sharding.make_mesh(4, 2)
    run_chunk, place = driver.make_sharded_project_chunk_2d(
        spec, mesh, "leapfrog", 1.0, ProjectWeights(), batch_size=64)
    opt = optim.init(mix.params(), {k: 1e-4 for k in mix.params()},
                     patience=50)
    carry = place(mix.params(), opt, mix.alive,
                  jax.lax.stop_gradient(mix.positions), old.params(),
                  old.alive, scene.advance_domain, 0.025)
    text = run_chunk.lower(carry, jax.random.PRNGKey(0), 1).compile() \
        .as_text()
    counts, nbytes = audit_collectives(text)
    total = sum(counts.values())
    # measured 8 on the virtual mesh at r3 (loss psums + PCGrad dot psums);
    # a regression here means the partitioner started moving params or
    # batch data instead of scalars
    assert total <= 8, counts
    assert nbytes <= 64 * 1024, (counts, nbytes)


def test_projection_3d_collective_count():
    n = 256
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mk = lambda s: GaussianMixture.create(
        np.random.RandomState(s).uniform(0.1, 0.9, (n, 3)), spec, pad=False)
    mix, old = mk(3), mk(4)
    mesh = sharding.make_mesh(4, 2)
    run_chunk, place = driver.make_sharded_project_chunk_3d(
        spec, mesh, "ring_collide", (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
        10.0, ProjectWeights(delta_pos=0.0), batch_size=64)
    opt = optim.init(mix.params(), {k: 3e-4 for k in mix.params()},
                     patience=50)
    carry = place(mix.params(), opt, mix.alive, old.params(), old.alive,
                  0.1)
    text = run_chunk.lower(carry, jax.random.PRNGKey(0), 1).compile() \
        .as_text()
    counts, nbytes = audit_collectives(text)
    assert sum(counts.values()) <= 6, counts
    assert nbytes <= 256 * 1024, (counts, nbytes)
