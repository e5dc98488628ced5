"""Scene registries (2D and 3D).

The reference keeps scene configuration in module-level dicts keyed by name
and resolves the analytic field via ``eval(cmd_args.init_cond)`` at import
time (reference 2D/init_cond.py, 2D/initialize.py:192). Here scenes are
explicit objects in a registry — no import-time side effects, no eval.
"""

from gaussian_fluids_tpu.scenes.registry2d import SCENES_2D, get_scene_2d  # noqa: F401
from gaussian_fluids_tpu.scenes.registry3d import SCENES_3D, get_scene_3d  # noqa: F401
