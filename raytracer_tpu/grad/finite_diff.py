"""Finite-difference gradient validation (BASELINE gradient-correctness
target: AD gradients of pixel loss w.r.t. scene parameters match central
differences)."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np
import jax.numpy as jnp


def finite_diff_grad(loss_fn: Callable, params: Dict[str, jax.Array],
                     eps: float = 1e-3) -> Dict[str, np.ndarray]:
    """Central-difference gradient of loss_fn at params, one coordinate at a
    time.  O(2 * n_coords) renders — keep the configs tiny."""
    flat, treedef = jax.tree.flatten(params)
    flat = [np.asarray(x, np.float64) for x in flat]
    grads = [np.zeros_like(x) for x in flat]
    for li, leaf in enumerate(flat):
        it = np.nditer(leaf, flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            for sign in (+1.0, -1.0):
                bumped = [l.copy() for l in flat]
                bumped[li][idx] += sign * eps
                p = jax.tree.unflatten(
                    treedef, [jnp.asarray(b, jnp.float32) for b in bumped])
                val = float(loss_fn(p))
                grads[li][idx] += sign * val
            grads[li][idx] /= (2.0 * eps)
    return jax.tree.unflatten(treedef, grads)
