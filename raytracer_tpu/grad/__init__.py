"""Differentiable rendering / inverse rendering.

The reference is non-differentiable Rust (SURVEY.md §2.4 last row); this
subsystem is new capability mandated by BASELINE.json: end-to-end ``jax.grad``
through intersection and shading, validated against finite differences, plus
the gradient-descent scene-recovery loop.
"""

from .params import apply_params, extract_params, PARAM_FIELDS
from .inverse import (image_loss, make_loss_fn, make_train_step,
                      make_silhouette_train_step, fit, FitResult)
from .finite_diff import finite_diff_grad
from .silhouette import (glass_silhouette_grad, mirror_silhouette_grad,
                         mirror_triangle_silhouette_grad, silhouette_grad,
                         triangle_silhouette_grad,
                         value_and_grad_with_silhouette)

__all__ = [
    "apply_params", "extract_params", "PARAM_FIELDS",
    "image_loss", "make_loss_fn", "make_train_step",
    "make_silhouette_train_step", "fit", "FitResult",
    "finite_diff_grad",
    "silhouette_grad", "mirror_silhouette_grad",
    "glass_silhouette_grad", "mirror_triangle_silhouette_grad",
    "triangle_silhouette_grad", "value_and_grad_with_silhouette",
]
