"""Bias-grid dump / restart files.

Reference parity: ``dump_grid(fname, period)`` / ``restart_from_grid(fname)``
of ``IntegratorMetaDynamics`` (SURVEY.md §3.5).  Format is npz (new format is
allowed; it must round-trip CV ranges, num_points, σ, mode and the grids —
SURVEY.md §5 checkpoint/resume), written atomically (temp + rename).
"""
from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ..bias.grid import BiasGrid, GridSpec
from ..bias.metad import BiasState


def dump_grid(path: str, bias: BiasState, mode: str = "standard",
              deltaT: float = 1.0) -> None:
    spec = bias.grid.spec
    payload = dict(
        lo=np.asarray(spec.lo), hi=np.asarray(spec.hi),
        sigma=np.asarray(spec.sigma),
        shape=np.asarray(spec.shape, np.int64),
        periodic=np.asarray(spec.periodic, bool),
        V=np.asarray(bias.grid.V), dV=np.asarray(bias.grid.dV),
        n_hills=np.asarray(bias.n_hills),
        mode=np.asarray(mode), deltaT=np.asarray(deltaT, np.float32),
    )
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


def load_grid(path: str) -> tuple[BiasState, dict]:
    """Load a grid dump; returns (BiasState, metadata dict)."""
    z = np.load(path, allow_pickle=False)
    spec = GridSpec(
        lo=jnp.asarray(z["lo"]), hi=jnp.asarray(z["hi"]),
        sigma=jnp.asarray(z["sigma"]),
        shape=tuple(int(n) for n in z["shape"]),
        periodic=tuple(bool(p) for p in z["periodic"]),
    )
    bias = BiasState(
        grid=BiasGrid(spec=spec, V=jnp.asarray(z["V"]), dV=jnp.asarray(z["dV"])),
        n_hills=jnp.asarray(z["n_hills"]),
    )
    meta = {"mode": str(z["mode"]), "deltaT": float(z["deltaT"])}
    return bias, meta
