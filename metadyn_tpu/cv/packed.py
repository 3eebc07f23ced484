"""Collective variables over the packed (slot-layout) state.

Same math as the particle-order CVs (cv/lamellar.py etc.), evaluated
directly on the SoA slot arrays — no unpacking gathers in the hot loop.
Per-type amplitudes are carried as per-slot attributes (scattered at
pack/repack time), so vacant slots contribute exactly zero.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..core.state import System
from ..ops.packed import PackedState


@struct.dataclass
class PackedLamellar:
    """Lamellar order parameter on packed state (cf. cv/lamellar.py):

        s = (1/N) Σ_slots amp_slot · cos(k_j·r_slot + φ_j)

    ``amp`` must be registered as a per-slot attribute named
    ``lam_<name>`` at pack time (mode coefficient per particle; 0 vacant).
    """

    lattice_vectors: jax.Array  # (M, 3) integer Miller indices
    phases: jax.Array           # (M,)
    n_real: int = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False, default="lamellar")

    @classmethod
    def create(cls, lattice_vectors, n_real, phases=None, name="lamellar"):
        lv = np.asarray(lattice_vectors, np.float32).reshape(-1, 3)
        ph = np.zeros(lv.shape[0], np.float32) if phases is None else \
            np.asarray(phases, np.float32)
        return cls(lattice_vectors=jnp.asarray(lv), phases=jnp.asarray(ph),
                   n_real=n_real, name=name)

    @property
    def attr_name(self) -> str:
        return f"lam_{self.name}"

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def value(self, state: PackedState, system: System) -> jax.Array:
        amp = state.attrs[self.attr_name]           # (Npad,)
        k = 2.0 * jnp.pi * self.lattice_vectors / state.box.L[None, :]  # (M,3)
        # phase per (mode, slot): SoA contraction, no (Npad, 3) layout
        s = jnp.float32(0.0)
        for m in range(self.lattice_vectors.shape[0]):
            phase = (k[m, 0] * state.r[0] + k[m, 1] * state.r[1]
                     + k[m, 2] * state.r[2] + self.phases[m])
            s = s + jnp.sum(amp * jnp.cos(phase))
        return s / self.n_real


@struct.dataclass
class PackedMSD:
    """Mean-squared displacement CV on packed state (cf. reference MSD CV,
    SURVEY.md §2a): s = (1/N) Σ |r_unwrapped − r₀|².  Reference positions
    are per-slot attributes ``msd_x/y/z`` (unwrapped, repacked with slots)."""

    n_real: int = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False, default="msd")

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def value(self, state: PackedState, system: System) -> jax.Array:
        valid = (state.pid < self.n_real).astype(jnp.float32)
        s = jnp.float32(0.0)
        for d, nm in enumerate(("msd_x", "msd_y", "msd_z")):
            unwrapped = state.r[d] + state.image[d].astype(jnp.float32) \
                * state.box.L[d]
            diff = (unwrapped - state.attrs[nm]) * valid
            s = s + jnp.sum(diff * diff)
        return s / self.n_real


def msd_reference_attrs(pos: np.ndarray) -> dict:
    """Per-particle reference-position attributes for PackedMSD at pack time."""
    p = np.asarray(pos, np.float32)
    return {"msd_x": p[:, 0], "msd_y": p[:, 1], "msd_z": p[:, 2]}
