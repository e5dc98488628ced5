"""Gaussian Fluids on TPU — a JAX/XLA/Pallas-native grid-free fluid solver.

A from-scratch TPU-native framework with the capabilities of the reference
"Gaussian Fluids: A Grid-Free Fluid Solver based on Gaussian Spatial
Representation" (SIGGRAPH 2025) implementation (PyTorch + Taichi/CUDA).

Design (TPU-first, not a port):
  * The Gaussian mixture is a pytree of arrays; all field math is pure,
    ``vmap``-able and ``jit``-able (models/mixture.py, ops/field.py).
  * The reference's 16 hand-written Taichi CUDA kernels with manually derived
    backward passes (reference 2D/GSR.py:256-647, 3D/GSR.py:254-716) are
    replaced by (a) an MXU-friendly feature-matmul formulation of the
    Gaussian quad-form plus JAX autodiff — whose gradients provably equal the
    reference's hand-derived ones — and (b) fused Pallas TPU kernels for the
    hot paths. Gradient scatter becomes deterministic XLA reductions instead
    of CUDA atomics.
  * Multi-chip scaling via ``jax.sharding.Mesh`` + collectives (parallel/).
"""

__version__ = "0.1.0"

from gaussian_fluids_tpu.config import FieldSpec  # noqa: F401
from gaussian_fluids_tpu.models.mixture import GaussianMixture  # noqa: F401
