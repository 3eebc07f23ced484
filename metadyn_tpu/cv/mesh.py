"""Mesh order parameter / structure-factor CV — particle-mesh + FFT.

Reference parity: ``metadynamics/OrderParameterMesh{,GPU}.{h,cc,cu}``
(recalled, SURVEY.md §2a, §3.3): PPPM-style pipeline

    assign:  ρ(mesh) ← Σ_i a(type_i)·W_CIC(r_i)
    FFT:     ρ̂(k) = FFT[ρ]
    value:   s = (1/N²)·Σ_k |ρ̂(k)|²·u(k)

with u(k) a mode/convolution kernel (here: a Gaussian window around a
target |k₀| by default, or arbitrary per-k weights).  cuFFT/kissFFT/dfft
become ``jnp.fft.fftn`` (XLA TPU FFT); the CUDA scatter/gather kernels
become a differentiable CIC scatter-add — bias forces come from the shared
vjp (gather in reverse mode), matching the reference's mesh-force
back-interpolation (SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..core.state import State, System


def cic_assign(pos: jax.Array, weights: jax.Array, box, mesh_shape) -> jax.Array:
    """Cloud-in-cell (trilinear) particle→mesh assignment, differentiable."""
    nx, ny, nz = mesh_shape
    dims = jnp.asarray([nx, ny, nz], jnp.float32)
    # fractional coordinates: pos/L orthorhombic, h⁻¹·pos triclinic (the
    # mesh is a lattice-aligned grid either way — CIC weights are pure
    # fractional functions, so the assignment generalizes unchanged)
    from ..core.box import fractional
    frac = (fractional(pos, box) + 0.5) * dims  # (N, 3) mesh coords
    i0 = jnp.floor(frac - 0.5)
    t = frac - 0.5 - i0                         # weight toward the +1 corner
    i0 = i0.astype(jnp.int32)
    rho = jnp.zeros((nx, ny, nz), jnp.float32)
    dims_i = jnp.asarray([nx, ny, nz], jnp.int32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = (weights
                     * (t[:, 0] if cx else 1.0 - t[:, 0])
                     * (t[:, 1] if cy else 1.0 - t[:, 1])
                     * (t[:, 2] if cz else 1.0 - t[:, 2]))
                idx = jnp.mod(i0 + jnp.asarray([cx, cy, cz]), dims_i)
                rho = rho.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w)
    return rho


def _k_vectors(mesh_shape, box_L):
    ks = [2.0 * np.pi * np.fft.fftfreq(n, d=1.0) * n / l
          for n, l in zip(mesh_shape, box_L)]
    kx, ky, kz = np.meshgrid(*ks, indexing="ij")
    return np.sqrt(kx**2 + ky**2 + kz**2).astype(np.float32)


@struct.dataclass
class MeshOrderParameter:
    """``cv.mesh(nx, ny, nz, mode={type: coef}, k0=..., width=...)``.

    s = (1/N) Σ_k |ρ̂(k)|² u(k), with u(k) = exp(−(|k|−k₀)²/2w²) (k=0
    excluded) or an explicit (nx,ny,nz) weight array.
    """

    mode: jax.Array                 # (n_types,) per-type assignment coef
    u_k: Optional[jax.Array]        # explicit (nx,ny,nz) kernel (box-fixed)
    k0: float = struct.field(pytree_node=False)      # Gaussian window target
    width: float = struct.field(pytree_node=False)   # Gaussian window width
    mesh_shape: tuple = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False, default="mesh")

    @classmethod
    def create(cls, mesh_shape, box_L, mode, k0: Optional[float] = None,
               width: float = 0.5, u_k: Optional[np.ndarray] = None,
               name: str = "mesh") -> "MeshOrderParameter":
        """With ``k0``/``width`` (the default), u(|k|) is a Gaussian window
        evaluated at the CURRENT box's k-vectors every step — the CV
        follows the box under NPT exactly like the reference's per-box
        influence function, and the k-space virial is analytic.  An
        explicit ``u_k`` array is box-FIXED (pure fractional-mode weights):
        scale-invariant, zero virial.  ``box_L`` is unused in the Gaussian
        mode (kept for signature compatibility)."""
        mesh_shape = tuple(int(x) for x in mesh_shape)
        if u_k is None:
            assert k0 is not None, "give k0 (target |k|) or an explicit u_k"
        return cls(mode=jnp.asarray(np.asarray(mode, np.float32)),
                   u_k=None if u_k is None
                       else jnp.asarray(np.asarray(u_k, np.float32)),
                   k0=None if k0 is None else float(k0),
                   width=float(width),
                   mesh_shape=mesh_shape, name=name)

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def _kernels(self, box) -> tuple[jax.Array, jax.Array]:
        """(u_k, vir_k) at the current box.  vir_k is the PER-AXIS stack
        (3, nx, ny, nz): vir_d = u'(|k|)·k_d²/|k| (trace = u'(|k|)·|k|)."""
        if self.u_k is not None:
            return self.u_k, jnp.zeros((3,) + self.mesh_shape, jnp.float32)
        ms = [np.fft.fftfreq(n_) * n_ for n_ in self.mesh_shape]  # static
        mgrid = np.meshgrid(*ms, indexing="ij")
        if box.tilt is None:
            kd2 = jnp.stack([
                (2.0 * jnp.pi * jnp.asarray(m, jnp.float32) / box.L[d]) ** 2
                for d, m in enumerate(mgrid)])               # (3, nx, ny, nz)
        else:
            # triclinic: k(m) = 2π·(m @ h⁻¹); kd2 holds the Cartesian
            # components squared so kmag is exact for the tilted cell
            # (the per-axis virial split below is only used orthorhombic —
            # see bias_virial)
            from ..core.box import reciprocal_matrix
            B = reciprocal_matrix(box)                       # (3, 3)
            mg = [jnp.asarray(m, jnp.float32) for m in mgrid]
            kd2 = jnp.stack([
                (2.0 * jnp.pi
                 * (mg[0] * B[0, d] + mg[1] * B[1, d] + mg[2] * B[2, d]))
                ** 2
                for d in range(3)])
        kmag = jnp.sqrt(jnp.sum(kd2, axis=0))
        u = jnp.exp(-0.5 * ((kmag - self.k0) / self.width) ** 2)
        uprime = -((kmag - self.k0) / self.width**2) * u
        safe = jnp.where(kmag > 0.0, kmag, 1.0)
        vir = uprime[None] * kd2 / safe
        # exclude the k=0 (total density) mode
        u = jnp.where(kmag == 0.0, 0.0, u)
        vir = jnp.where(kmag[None] == 0.0, 0.0, vir)
        return u, vir

    def _rho_k2(self, state: State, system: System) -> jax.Array:
        w = self.mode[system.types]
        rho = cic_assign(state.pos, w, state.box, self.mesh_shape)
        return jnp.abs(jnp.fft.fftn(rho)) ** 2

    def value(self, state: State, system: System) -> jax.Array:
        n = state.pos.shape[0]
        u, _ = self._kernels(state.box)
        return jnp.sum(self._rho_k2(state, system) * u) / n

    def bias_virial(self, state: State, system: System,
                    dVds: jax.Array) -> jax.Array:
        """Per-axis (3,) k-space virial of the bias force: under the
        per-axis strain L_d→(1+ε_d)L_d, ρ̂ at fixed integer mode is
        invariant (CIC weights are pure fractional-coordinate functions),
        so the only ε_d-dependence is k_d → k_d/(1+ε_d) inside u:
        W_d = dVds·(1/N)·Σ_k |ρ̂|²·u'(|k|)·k_d²/|k|  (SURVEY.md §3.3).
        The trace recovers the uniform-scaling virial; without it, NPT +
        mesh-CV bias samples the wrong pressure.  Orthorhombic only: a
        per-axis strain of a tilted cell mixes tilt DOF into k, which this
        split does not model (triclinic mesh runs NVT/NVE)."""
        assert state.box.tilt is None, (
            "mesh bias_virial (NPT coupling) requires an orthorhombic box")
        n = state.pos.shape[0]
        _, vir = self._kernels(state.box)
        return dVds * jnp.sum(self._rho_k2(state, system)[None] * vir,
                              axis=(1, 2, 3)) / n
