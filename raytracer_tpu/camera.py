"""Pinhole camera as a JAX pytree.

Reference: ``/root/reference/raytracer/src/camera.rs``.  A camera is an origin
plus a viewport plane (lower-left corner, horizontal, vertical — camera.rs:8-15)
with three constructors (new_at :21-33, new_with_vertical_fov :34-48,
new_look_at :49-69).  ``cast_rays`` is the vectorized form of
``Camera::cast_ray`` (camera.rs:84-89): it maps whole [..., ] grids of (s, t)
viewport coordinates to ray origin/direction arrays in one shot.

The camera is a pytree of traced arrays, so moving the camera (the interactive
``move_camera_position`` path, lib.rs:60-63) re-runs a cached compiled render
without recompilation.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from . import maths


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    origin: jax.Array              # [3]
    lower_left_corner: jax.Array   # [3]
    horizontal: jax.Array          # [3]
    vertical: jax.Array            # [3]

    # -- constructors ------------------------------------------------------
    @staticmethod
    def new(aspect_ratio: float) -> "Camera":
        """camera.rs:18-20."""
        return Camera.new_at((0.0, 0.0, 0.0), aspect_ratio)

    @staticmethod
    def new_at(origin, aspect_ratio) -> "Camera":
        """camera.rs:21-33 — viewport height 2.0, focal length 1.0."""
        origin = jnp.asarray(origin, jnp.float32)
        viewport_height = jnp.float32(2.0)
        viewport_width = jnp.float32(aspect_ratio) * viewport_height
        focal_length = jnp.float32(1.0)
        horizontal = maths.vec3(viewport_width, 0.0, 0.0)
        vertical = maths.vec3(0.0, viewport_height, 0.0)
        llc = origin - maths.vec3(
            viewport_width / 2.0, viewport_height / 2.0, focal_length
        )
        return Camera(origin, llc, horizontal, vertical)

    @staticmethod
    def new_with_vertical_fov(origin, vertical_fov, aspect_ratio) -> "Camera":
        """camera.rs:34-48 — fov in radians."""
        origin = jnp.asarray(origin, jnp.float32)
        h = jnp.tan(jnp.float32(vertical_fov) / 2.0)
        viewport_height = jnp.float32(2.0) * h
        viewport_width = jnp.float32(aspect_ratio) * viewport_height
        focal_length = jnp.float32(1.0)
        horizontal = maths.vec3(viewport_width, 0.0, 0.0)
        vertical = maths.vec3(0.0, viewport_height, 0.0)
        llc = origin - maths.vec3(
            viewport_width / 2.0, viewport_height / 2.0, focal_length
        )
        return Camera(origin, llc, horizontal, vertical)

    @staticmethod
    def new_look_at(origin, look_at, up, vertical_fov, aspect_ratio) -> "Camera":
        """camera.rs:49-69.

        The reference's basis u = up x w and v = w x u use NVec3::cross,
        which does NOT renormalize (maths.rs:131-137) — preserved here, so
        off-axis look-at cameras match the reference's (slightly skewed)
        viewport exactly.  The reference asserts origin != look_at
        (camera.rs:50) and |v.y| > 1e-8 (camera.rs:61); those are host-side
        checks when called with concrete values.
        """
        origin = jnp.asarray(origin, jnp.float32)
        look_at = jnp.asarray(look_at, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        viewport_height = jnp.float32(2.0) * jnp.tan(jnp.float32(vertical_fov) / 2.0)
        viewport_width = viewport_height * jnp.float32(aspect_ratio)
        w = maths.normalize(origin - look_at)
        u = maths.cross(up, w)      # unnormalized (reference semantics)
        v = maths.cross(w, u)       # unnormalized
        horizontal = u * viewport_width
        vertical = v * viewport_height
        llc = origin - horizontal / 2.0 - vertical / 2.0 - w
        cam = Camera(origin, llc, horizontal, vertical)
        if not any(isinstance(x, jax.core.Tracer) for x in (origin, look_at, v)):
            delta = np.asarray(origin) - np.asarray(look_at)
            if np.all(np.abs(delta) < 1e-8):
                raise ValueError("Origin and look_at must differ!")
            if abs(np.asarray(v)[1]) <= 1e-8:
                raise ValueError(
                    "Origin and look_at can't have the same z-coordinate."
                )
        return cam

    # -- queries -----------------------------------------------------------
    def aspect_ratio(self):
        """camera.rs:70-72 — horizontal.x / vertical.y."""
        return self.horizontal[0] / self.vertical[1]

    def position(self):
        """camera.rs:91-93."""
        return self.origin

    def moved_by(self, delta) -> "Camera":
        """lib.rs:60-63 — move_camera_position rebuilds a new_at camera at
        the offset origin with the same aspect ratio."""
        return Camera.new_at(self.origin + jnp.asarray(delta, jnp.float32),
                             self.aspect_ratio())

    # -- ray generation ----------------------------------------------------
    def cast_rays(self, s, t):
        """Vectorized Camera::cast_ray (camera.rs:84-89).

        s, t: broadcastable arrays of viewport coordinates in [0, 1].
        Returns (origin [..., 3], direction [..., 3] unit).
        """
        s = jnp.asarray(s, jnp.float32)[..., None]
        t = jnp.asarray(t, jnp.float32)[..., None]
        direction = maths.normalize(
            self.lower_left_corner + s * self.horizontal + t * self.vertical
            - self.origin
        )
        origin = jnp.broadcast_to(self.origin, direction.shape)
        return origin, direction
