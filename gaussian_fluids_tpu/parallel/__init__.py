"""Multi-chip scaling (SURVEY.md §2.8 — new scope; the reference is
single-GPU). ``sharding`` holds the mesh axes and the verified per-epoch
shard_map steps (fit, clone re-fit, 2D/3D projection); ``driver`` holds
the runnable multi-chip loops (scanned chunk runner + host loop)."""

from gaussian_fluids_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, param_shardings, make_sharded_train_step,
    make_sharded_train_step_shardmap, make_sharded_clone_step,
    make_sharded_project_step_2d, make_sharded_project_step_3d)
from gaussian_fluids_tpu.parallel.driver import (  # noqa: F401
    make_sharded_project_chunk_2d, project_2d_sharded,
    make_sharded_project_chunk_3d, project_3d_sharded,
    make_sharded_clone_chunk, clone_velocity_field_sharded)
from gaussian_fluids_tpu.parallel.density import (  # noqa: F401
    make_sharded_density_step, advected_density_sharded)


def mesh_from_shape(mesh_shape, target_grid_res: int = 0):
    """CLI-facing mesh construction: (n_batch, n_gauss) -> Mesh, with the
    validation both advance entry points share. None -> None (single-device
    path). The sharded epochs evaluate exact per-epoch covector targets, so
    the cached-target mode is rejected rather than silently ignored."""
    if mesh_shape is None:
        return None
    if target_grid_res:
        raise ValueError(
            "--target_grid is unsupported with --mesh: the sharded "
            "projection/clone epochs evaluate exact per-epoch targets")
    import jax

    n_batch, n_gauss = mesh_shape
    n_dev = len(jax.devices())
    if n_batch * n_gauss > n_dev:
        raise ValueError(
            f"--mesh {n_batch}x{n_gauss} needs {n_batch * n_gauss} devices "
            f"but only {n_dev} are visible")
    return make_mesh(n_batch, n_gauss)
