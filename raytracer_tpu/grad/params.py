"""Optimizable scene parameters.

A parameter set is a plain dict pytree mapping field names to arrays; it can
cover any differentiable leaf of the Scene: sphere centers/radii, triangle
vertices, material colors (albedo), metal fuzz, dielectric ir.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable

import jax

from ..scene import Scene

# field name -> (getter, setter)
PARAM_FIELDS = (
    "sphere_center", "sphere_radius",
    "tri_v0", "tri_v1", "tri_v2",
    "mat_color", "mat_fuzz", "mat_ir",
)

_MATERIAL_FIELDS = {"mat_color": "color", "mat_fuzz": "fuzz", "mat_ir": "ir"}


def extract_params(scene: Scene, fields: Iterable[str]) -> Dict[str, jax.Array]:
    """Pull the named fields out of a Scene as an optimizable dict pytree."""
    params = {}
    for f in fields:
        if f not in PARAM_FIELDS:
            raise ValueError(f"unknown param field {f!r}; valid: {PARAM_FIELDS}")
        if f in _MATERIAL_FIELDS:
            params[f] = getattr(scene.materials, _MATERIAL_FIELDS[f])
        else:
            params[f] = getattr(scene, f)
    return params


def apply_params(scene: Scene, params: Dict[str, jax.Array]) -> Scene:
    """Return a Scene with the given fields replaced by the param arrays.

    Pure function of (scene, params) — safe under jit/grad.
    """
    scene_updates = {}
    material_updates = {}
    for f, v in params.items():
        if f in _MATERIAL_FIELDS:
            material_updates[_MATERIAL_FIELDS[f]] = v
        elif f in PARAM_FIELDS:
            scene_updates[f] = v
        else:
            raise ValueError(f"unknown param field {f!r}")
    if material_updates:
        scene_updates["materials"] = dataclasses.replace(
            scene.materials, **material_updates)
    return dataclasses.replace(scene, **scene_updates)
