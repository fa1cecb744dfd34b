"""Color utilities.

Reference: ``/root/reference/raytracer/src/color.rs`` — an f32 RGBA ``Color``
(alpha defaulting to 1.0, color.rs:21-23) and a ``ColorU8`` RGBA8 output type
(color.rs:3-10).  Arrays here: colors are ``[..., 3]`` (alpha is provably a
constant 1.0 per sample in the reference pipeline — see render.py) and u8
conversion applies the reference's sqrt-gamma and 255.999 scale/truncate
(common.rs:343-356).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def color(r, g, b):
    """Color::new — alpha implied 1.0 (color.rs:21-23)."""
    return jnp.stack([jnp.asarray(r, jnp.float32),
                      jnp.asarray(g, jnp.float32),
                      jnp.asarray(b, jnp.float32)], axis=-1)


def lerp_with_alpha(a, b, t):
    """color.rs:39-47 — NOTE the reference 'lerp' MULTIPLIES the two scaled
    colors instead of adding them (a quirk; unused by the render path)."""
    t = jnp.float32(t)
    return (a * (1.0 - t)) * (b * t)


def to_u8(rgb_linear_mean, clip=True):
    """sqrt gamma + 255.999 scale + truncating u8 (common.rs:343-356)."""
    x = jnp.sqrt(jnp.maximum(rgb_linear_mean, 0.0)) * jnp.float32(255.999)
    if clip:
        x = jnp.clip(x, 0.0, 255.0)
    return x.astype(jnp.uint8)


def from_u8(rgb_u8):
    """Inverse mapping (approximate): u8 -> linear radiance."""
    x = jnp.asarray(rgb_u8, jnp.float32) / jnp.float32(255.999)
    return x * x
