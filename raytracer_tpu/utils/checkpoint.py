"""Tiny pytree checkpointing (npz + pickle-free).

Saves a (params, opt_state, step, losses) tuple as flattened arrays in a
single .npz with the treedef recorded as a repr string for validation.
Orbax would be overkill for a handful of small arrays; this keeps resume
dependency-free and safe (no pickled code objects).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, List, Optional, Tuple

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return [np.asarray(l) for l in leaves], str(treedef)


def save(path: str, params, opt_state, step: int, losses: List[float]) -> None:
    """Atomic save (write temp + rename)."""
    p_leaves, p_def = _flatten(params)
    o_leaves, o_def = _flatten(opt_state)
    arrays = {f"p{i}": a for i, a in enumerate(p_leaves)}
    arrays.update({f"o{i}": a for i, a in enumerate(o_leaves)})
    arrays["losses"] = np.asarray(losses, np.float32)
    meta = {"step": step, "n_params": len(p_leaves),
            "n_opt": len(o_leaves), "p_def": p_def, "o_def": o_def}
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        # pass the handle: np.savez would silently append ".npz" to a path
        # that doesn't end with it, leaving the temp empty
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_latest(path: str, params_treedef=None
                ) -> Optional[Tuple[Any, Any, int, List[float]]]:
    """Load a checkpoint; returns None if absent.

    The stored treedefs are reprs, so the caller's params/opt_state
    STRUCTURE must match what was saved; leaves are rebuilt by unflattening
    the caller-side treedef when given, else returned as flat lists wrapped
    by the original treedef reconstruction path in grad.inverse (which
    re-uses the live structures).
    """
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        p_leaves = [z[f"p{i}"] for i in range(meta["n_params"])]
        o_leaves = [z[f"o{i}"] for i in range(meta["n_opt"])]
        losses = [float(x) for x in z["losses"]]
    return (_Unflattened(p_leaves, meta["p_def"]),
            _Unflattened(o_leaves, meta["o_def"]),
            meta["step"], losses)


class _Unflattened:
    """Deferred unflatten: grad.inverse rebinds leaves onto its live
    structures via rebuild()."""

    def __init__(self, leaves, treedef_repr):
        self.leaves = leaves
        self.treedef_repr = treedef_repr

    def rebuild(self, like):
        _, treedef = jax.tree.flatten(like)
        if str(treedef) != self.treedef_repr:
            raise ValueError(
                f"checkpoint structure mismatch:\n saved {self.treedef_repr}\n"
                f" live  {treedef}")
        return jax.tree.unflatten(treedef, self.leaves)
