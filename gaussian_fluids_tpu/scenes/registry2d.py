"""2D scene registry: domains, particle counts, physics constants, fields,
boundary samplers and the Karman moving-domain hooks.

Data mirrors reference 2D/init_cond.py:12-131 exactly; mechanism is an
explicit Scene object instead of import-time module globals + ``eval``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple


from gaussian_fluids_tpu.scenes import boundaries2d, fields2d

PI = math.pi

_INITIALIZE_DOMAIN = {
    "taylor_green": (0.0, 2.0 * PI, 0.0, 2.0 * PI),
    "taylor_vortex": (-5.0, 5.0, -5.0, 5.0),
    "leapfrog": (-5.0, 5.0, -5.0, 5.0),
    "vortices_pass": (0.0, 1.0, 0.0, 1.0),
    "vortices_pass_narrow": (0.0, 1.0, 0.0, 1.0),
    "vortices_pass_noslip": (0.0, 1.0, 0.0, 1.0),
    "vortices_pass_particles": (-5.0, 5.0, -5.0, 5.0),
    "karman": (-6.10321, 1.906778, -0.598466, 0.60349),
}

_ADVANCE_DOMAIN = dict(_INITIALIZE_DOMAIN)

_VISUALIZE_DOMAIN = dict(_INITIALIZE_DOMAIN)
_VISUALIZE_DOMAIN["vortices_pass_particles"] = (-2.5, 2.5, -2.5, 2.5)
_VISUALIZE_DOMAIN["karman"] = (-1.10321, 1.906778, -0.598466, 0.60349)

_PARTICLE_COUNT = {
    "taylor_green": (24, 24),
    "taylor_vortex": (71, 71),
    "leapfrog": (71, 71),
    "vortices_pass": (71, 71),
    "vortices_pass_narrow": (71, 71),
    "vortices_pass_noslip": (71, 71),
    "vortices_pass_particles": (71, 71),
    "karman": (400, 60),
}

_VISUALIZE_RES = {
    "taylor_green": (200, 200),
    "taylor_vortex": (200, 200),
    "leapfrog": (200, 200),
    "vortices_pass": (200, 200),
    "vortices_pass_narrow": (200, 200),
    "vortices_pass_noslip": (200, 200),
    "vortices_pass_particles": (200, 200),
    "karman": (501, 200),
}

_OTHER_INFO = {
    "taylor_green": {},
    "taylor_vortex": {
        "U": 3.0, "a": 0.5,
        "vortex_pos1": (-0.8, 0.0), "vortex_pos2": (0.8, 0.0),
    },
    "leapfrog": {
        "U": 0.5, "a": 0.3,
        "vortex_pos1": (-3.0, -3.0), "vortex_pos2": (-1.0, -3.0),
        "vortex_pos3": (1.0, -3.0), "vortex_pos4": (3.0, -3.0),
    },
    "vortices_pass": {
        "U": 5e-3, "a": 3e-2,
        "vortex_pos1": (0.1, 0.525), "vortex_pos2": (0.1, 0.475),
        "obstacle_pos1": (0.5, 0.27), "obstacle_pos2": (0.5, 0.73),
        "obstacle_radius": 60.0 / 511.0,
    },
    "vortices_pass_narrow": {
        "U": 5e-3, "a": 3e-2,
        "vortex_pos1": (0.1, 0.525), "vortex_pos2": (0.1, 0.475),
        "obstacle_pos1": (0.5, 0.285), "obstacle_pos2": (0.5, 0.715),
        "obstacle_radius": 60.0 / 511.0,
    },
    "vortices_pass_noslip": {
        "U": 5e-3, "a": 3e-2,
        "vortex_pos1": (0.1, 0.525), "vortex_pos2": (0.1, 0.475),
        "obstacle_pos1": (0.5, 0.27), "obstacle_pos2": (0.5, 0.73),
        "obstacle_radius": 60.0 / 511.0,
    },
    "vortices_pass_particles": {
        "obstacle_pos1": (0.0, 1.0), "obstacle_pos2": (0.0, -1.0),
        "obstacle_radius": 0.25,
    },
    "karman": {
        "v_magnitude": 0.5,
        "obstacle_pos": (-0.80356845, -0.00502235),
        "obstacle_radius": 0.04553178393357534,
        "d0": PI / 15.0,
    },
}


def _scaling_factor(domain) -> float:
    """The target-space rule, defined once (reference 2D/init_cond.py:22-25):
    both the Scene2D property and scene construction must agree."""
    x0, x1, y0, y1 = domain
    return 10.0 / min(x1 - x0, y1 - y0)


@dataclasses.dataclass
class Scene2D:
    name: str
    initialize_domain: Tuple[float, float, float, float]
    advance_domain: Tuple[float, float, float, float]  # initial value
    visualize_domain: Tuple[float, float, float, float]
    particle_count: Tuple[int, int]
    visualize_res: Tuple[int, int]
    info: Dict
    velocity: Callable     # (B,2) scaled? NO: original space (B,2)->(B,2)
    velocity_jac: Callable
    boundary_sampler_1: Optional[Callable]
    boundary_sampler_2: Optional[Callable]

    @property
    def scaling_factor(self) -> float:
        """10 / min(initialize-domain extent) (reference
        2D/init_cond.py:22-25): all solving happens in this target space."""
        return _scaling_factor(self.initialize_domain)

    # Field converters (reference 2D/init_cond.py:435-453)
    def target_velocity(self, x):
        return self.scaling_factor * self.velocity(x / self.scaling_factor)

    def target_velocity_jac(self, x):
        return self.velocity_jac(x / self.scaling_factor)

    def extra_advect(self, adv_domain, dt):
        """Karman inflow domain growth (reference 2D/init_cond.py:267-271):
        returns the updated advance domain (host-side tuple)."""
        if self.name != "karman":
            return adv_domain
        x0 = min(adv_domain[0] + dt * self.info["v_magnitude"],
                 self.visualize_domain[0])
        return (x0,) + tuple(adv_domain[1:])

    def advance_domain_at(self, start_frame: int, dt: float):
        """Reconstruct the advance domain on resume (reference
        `karman_extra_loader`, 2D/init_cond.py:284-298)."""
        if self.name != "karman":
            return self.advance_domain
        x0 = min(self.initialize_domain[0]
                 + start_frame * dt * self.info["v_magnitude"],
                 self.visualize_domain[0])
        return (x0,) + tuple(self.advance_domain[1:])


def get_scene_2d(name: str) -> Scene2D:
    if name not in _INITIALIZE_DOMAIN:
        raise KeyError(
            f"unknown 2D scene {name!r}; valid: {sorted(_INITIALIZE_DOMAIN)}")
    info = dict(_OTHER_INFO[name])
    if name == "karman":
        info["visualize_x_min"] = _VISUALIZE_DOMAIN["karman"][0]
    vel, jac = fields2d.make_field(name, info)
    sf = _scaling_factor(_INITIALIZE_DOMAIN[name])
    s1, s2 = boundaries2d.make_samplers(name, info, sf)
    return Scene2D(
        name=name,
        initialize_domain=_INITIALIZE_DOMAIN[name],
        advance_domain=_ADVANCE_DOMAIN[name],
        visualize_domain=_VISUALIZE_DOMAIN[name],
        particle_count=_PARTICLE_COUNT[name],
        visualize_res=_VISUALIZE_RES[name],
        info=info,
        velocity=vel,
        velocity_jac=jac,
        boundary_sampler_1=s1,
        boundary_sampler_2=s2,
    )


SCENES_2D = tuple(sorted(_INITIALIZE_DOMAIN))
