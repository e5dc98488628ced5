"""Roofline accounting model (utils/roofline.py): the FLOP counts must
track the kernel structure and the utilization math must be consistent."""

import numpy as np

from gaussian_fluids_tpu import FieldSpec, GaussianMixture
from gaussian_fluids_tpu.utils import roofline


def test_flop_counts_scale_with_dim():
    # hand-audited values for the 2D forward (see roofline.py docstrings):
    # tile quantities 2 + 6 + 4 + 2 = 14; + 3 + 2*2 + 2*(2 + 4) = 33
    assert roofline.tile_quantities_flops(2) == 14
    assert roofline.fwd_flops_per_pair(2, 2) == 33
    # 3D forward: tile 3 + 15 + 6 + 2 = 26; + 3 + 6 + 3*(2 + 6) = 59
    assert roofline.tile_quantities_flops(3) == 26
    assert roofline.fwd_flops_per_pair(3, 3) == 59
    # backward > forward, 3D > 2D
    assert roofline.bwd_dn_flops_per_pair(2, 2) > \
        roofline.fwd_flops_per_pair(2, 2)
    assert roofline.bwd_dn_flops_per_pair(3, 3) > \
        roofline.bwd_dn_flops_per_pair(2, 2)


def test_epoch_cost_and_utilization():
    c = roofline.projection_epoch_cost_2d(512, 5120, density=0.5)
    assert c.pairs == 0.5 * 512 * 5120
    assert c.flops > c.pairs * 100   # > 100 flops/pair across the epoch
    u = c.utilization(2500.0, "v5e")
    assert 0 < u["mfu_bf16_pct"] < 100
    assert u["vpu_fp32_pct_hi"] > u["vpu_fp32_pct_lo"] > 0
    assert u["hbm_pct"] < 100
    # 3D epoch at ring_collide scale: more flops/pair than 2D
    c3 = roofline.projection_epoch_cost_3d(8192, 64512, density=0.13)
    assert c3.flops / c3.pairs > c.flops / c.pairs


def test_measured_tile_density():
    rng = np.random.RandomState(0)
    n = 600
    spec = FieldSpec.create((-5, -5), (5, 5), n, d=2, vdim=2)
    mix = GaussianMixture.create(rng.uniform(-4, 4, (n, 2)), spec)
    mix = mix.spatially_sorted()
    x = rng.uniform(-4, 4, (512, 2)).astype(np.float32)
    rho = roofline.measured_tile_density(mix, spec, x)
    assert 0.0 < rho <= 1.0
    # a compact cloud of queries should cull more than a spread one
    x_tight = rng.uniform(-0.5, 0.5, (512, 2)).astype(np.float32)
    rho_tight = roofline.measured_tile_density(mix, spec, x_tight)
    assert rho_tight <= rho + 1e-6


def test_reference_bound_orders():
    lo, hi = roofline.reference_gpu_bound_2d()
    assert 0 < lo < hi < 50000


def test_reference_gpu_bound_3d_monotone():
    from gaussian_fluids_tpu.utils import roofline
    lo, hi = roofline.reference_gpu_bound_3d(2e5, 4e4, 1.6e6)
    assert 0 < lo < hi
    # more atomic work -> tighter (slower) bound
    lo2, hi2 = roofline.reference_gpu_bound_3d(2e6, 4e5, 1.6e7)
    assert lo2 < lo and hi2 < hi
    # launch floor dominates as pairs -> 0
    lo0, hi0 = roofline.reference_gpu_bound_3d(0, 0, 0)
    assert abs(hi0 - 1.0 / 420e-6) / hi0 < 1e-6


def test_measured_pair_stats_3d_small():
    import numpy as np
    from gaussian_fluids_tpu import FieldSpec, GaussianMixture
    from gaussian_fluids_tpu.utils import roofline
    n = 64
    r = np.random.RandomState(0)
    spec = FieldSpec.create((0, 0, 0), (1, 1, 1), n, d=3, vdim=3)
    mix = GaussianMixture.create(r.uniform(0.2, 0.8, (n, 3)), spec,
                                 pad=False)
    x = r.uniform(0, 1, (256, 3)).astype(np.float32)
    visited, contrib, bnd = roofline.measured_pair_stats_3d(mix, spec, x, x)
    # the 27-cell walk can only over-approximate the exact clamp support
    assert visited >= contrib > 0
    assert bnd == contrib  # same points passed for both
