"""Combined atomic checkpoint / resume.

Reference parity + upgrade (SURVEY.md §5 "checkpoint/resume"): the
reference persists state across grid file + hill log + HOOMD snapshot;
here ONE atomic npz holds everything needed for bitwise resume: the full
MD state pytree, bias grid, PRNG key, and step counter.  Written
temp+rename so a crash never leaves a torn file; fault-injection resume is
covered by tests (SURVEY.md §5 failure detection).
"""
from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str, out: dict) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}__treedef"] = np.asarray(str(treedef))
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def save_checkpoint(path: str, carry: Any, extra: dict | None = None) -> None:
    """Atomically persist a sampler carry (any pytree) + optional extras."""
    payload: dict = {}
    _flatten(carry, "carry", payload)
    for k, v in (extra or {}).items():
        payload[f"extra__{k}"] = np.asarray(v)
    dirname = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, template: Any) -> tuple[Any, dict]:
    """Restore a carry pytree using ``template`` for structure/dtypes.

    Returns (carry, extras).  The template's treedef must match the one
    stored at save time — a coincidentally-equal leaf count with a
    different structure would silently misassign arrays otherwise.
    """
    z = np.load(path, allow_pickle=False)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    saved_treedef = str(z["carry__treedef"])
    if saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  saved:    {saved_treedef}\n"
            f"  template: {treedef}")
    leaves = []
    for i, leaf_t in enumerate(leaves_t):
        arr = z[f"carry__{i}"]
        if hasattr(leaf_t, "dtype"):
            arr = jnp.asarray(arr, getattr(leaf_t, "dtype"))
        leaves.append(arr)
    carry = jax.tree_util.tree_unflatten(treedef, leaves)
    extras = {k[len("extra__"):]: z[k] for k in z.files if k.startswith("extra__")}
    return carry, extras
