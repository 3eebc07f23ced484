"""Hill log file — PLUMED-compatible column format.

Reference parity: the hill file of ``IntegratorMetaDynamics``
(``filename=``, ``overwrite=``; one row per hill: timestep, s⃗, σ⃗, W' —
SURVEY.md §3.5), written so offline FES reconstruction tools (PLUMED
``sum_hills``-style) can consume it.
"""
from __future__ import annotations

import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from ..sampler import MetadSampler


class HillLog:
    def __init__(self, path: str, sampler: "MetadSampler", overwrite: bool = False):
        self.path = path
        self._sampler = sampler
        # hill-list (non-grid) mode carries per-CV widths on the sampler
        self._sigma = (np.asarray(sampler.grid_spec.sigma)
                       if sampler.grid_spec is not None
                       else np.asarray(sampler.bias.sigma))
        names = [cv.log_name for cv in sampler.cvs]
        if overwrite or not os.path.exists(path):
            with open(path, "w") as f:
                cols = ["step"] + names + [f"sigma_{n}" for n in names] + ["height"]
                f.write("#! FIELDS " + " ".join(cols) + "\n")

    def append(self, recs) -> None:
        """recs: stacked HillRecord pytree from a run segment (host numpy)."""
        step = np.atleast_1d(np.asarray(recs.step))
        center = np.atleast_2d(np.asarray(recs.center))
        height = np.atleast_1d(np.asarray(recs.height))
        sigma = self._sigma
        with open(self.path, "a") as f:
            for i in range(step.shape[0]):
                row = [f"{int(step[i])}"]
                row += [f"{x:.8g}" for x in center[i]]
                row += [f"{x:.8g}" for x in sigma]
                row += [f"{height[i]:.8g}"]
                f.write(" ".join(row) + "\n")


def read_hills(path: str) -> dict[str, np.ndarray]:
    """Read a hill file back into arrays (steps, centers, sigmas, heights)."""
    with open(path) as f:
        header = f.readline().strip()
        assert header.startswith("#! FIELDS")
        names = header.split()[2:]
        data = np.atleast_2d(np.loadtxt(f, ndmin=2))
    d = (len(names) - 2) // 2
    if data.size == 0:
        data = np.zeros((0, len(names)))
    return {
        "step": data[:, 0].astype(np.int64),
        "center": data[:, 1 : 1 + d],
        "sigma": data[:, 1 + d : 1 + 2 * d],
        "height": data[:, -1],
        "cv_names": names[1 : 1 + d],
    }


def fes_from_hills(path: str, grid_coords: list[np.ndarray],
                   mode: str = "standard", kT: float = 1.0,
                   deltaT: float = 1.0) -> np.ndarray:
    """Offline FES reconstruction by direct hill summation (the PLUMED
    ``sum_hills`` equivalent; SURVEY.md §3.5)."""
    h = read_hills(path)
    mesh = np.meshgrid(*grid_coords, indexing="ij")
    V = np.zeros(mesh[0].shape)
    for c, sig, w in zip(h["center"], h["sigma"], h["height"]):
        expo = sum(((m - ci) / si) ** 2 for m, ci, si in zip(mesh, c, sig))
        V += w * np.exp(-0.5 * expo)
    F = -V if mode == "standard" else -(kT + deltaT) / deltaT * V
    return F - F.min()


def fes_error_from_hills(path: str, grid_coords: list[np.ndarray],
                         n_blocks: int = 4, mode: str = "standard",
                         kT: float = 1.0, deltaT: float = 1.0,
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Time-block FES convergence estimate (the standard ``sum_hills``
    block analysis): snapshot the cumulative FES at ``n_blocks`` points in
    hill time, align each snapshot (an FES is defined up to a constant),
    and report the per-node standard deviation across snapshots alongside
    the final FES.  A converged run shows a small, flat error field;
    systematic drift (still-filling wells) shows up as localized error.

    Returns ``(F, err)`` — the full-run FES (min-shifted) and the aligned
    across-block std-dev on the same grid."""
    h = read_hills(path)
    n = h["step"].size
    assert n >= n_blocks >= 2, (n, n_blocks)
    mesh = np.meshgrid(*grid_coords, indexing="ij")
    scale = -1.0 if mode == "standard" else -(kT + deltaT) / deltaT
    bounds = [int(round(n * (k + 1) / n_blocks)) for k in range(n_blocks)]
    V = np.zeros(mesh[0].shape)
    snaps, i0 = [], 0
    for b in bounds:
        for c, sig, w in zip(h["center"][i0:b], h["sigma"][i0:b],
                             h["height"][i0:b]):
            expo = sum(((m - ci) / si) ** 2
                       for m, ci, si in zip(mesh, c, sig))
            V += w * np.exp(-0.5 * expo)
        i0 = b
        Fk = scale * V
        snaps.append(Fk - Fk.mean())
    err = np.std(np.stack(snaps), axis=0, ddof=1)
    F = scale * V
    return F - F.min(), err
