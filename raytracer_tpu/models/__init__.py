"""Scene "model zoo": builders for the benchmark/test scenes.

The reference ships exactly one scene asset (``raytracer/src/world.txt``, the
8-sphere default world) plus the 2-triangle FFI example scene
(``examples/c_raytracer.rs:15-45``).  BASELINE.json's configs add the
one-weekend random-sphere scene, a triangle-mesh scene, and a Cornell-style
box — all built here as SoA Scene pytrees.
"""

from . import obj
from .builders import (
    default_world,
    default_world_source,
    ffi_example_world,
    ffi_example_source,
    sphere_and_ground,
    random_spheres,
    cornell_spheres,
    cube_mesh,
    icosphere_mesh,
    mesh_scene,
    obj_mesh_scene,
)

__all__ = [
    "default_world", "default_world_source", "ffi_example_world",
    "ffi_example_source", "sphere_and_ground", "random_spheres",
    "cornell_spheres", "cube_mesh", "icosphere_mesh", "mesh_scene",
    "obj_mesh_scene", "obj",
]
