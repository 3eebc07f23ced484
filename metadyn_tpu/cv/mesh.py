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
    frac = (pos / box.L + 0.5) * dims          # (N, 3) mesh coords
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
    u_k: jax.Array                  # (nx, ny, nz) k-space kernel
    mesh_shape: tuple = struct.field(pytree_node=False)
    name: str = struct.field(pytree_node=False, default="mesh")

    @classmethod
    def create(cls, mesh_shape, box_L, mode, k0: Optional[float] = None,
               width: float = 0.5, u_k: Optional[np.ndarray] = None,
               name: str = "mesh") -> "MeshOrderParameter":
        mesh_shape = tuple(int(x) for x in mesh_shape)
        box_L = np.asarray(box_L, np.float32).reshape(-1)
        if box_L.size == 1:
            box_L = np.repeat(box_L, 3)
        if u_k is None:
            assert k0 is not None, "give k0 (target |k|) or an explicit u_k"
            kmag = _k_vectors(mesh_shape, box_L)
            u_k = np.exp(-0.5 * ((kmag - k0) / width) ** 2)
            u_k[0, 0, 0] = 0.0  # exclude the k=0 (total density) mode
        return cls(mode=jnp.asarray(np.asarray(mode, np.float32)),
                   u_k=jnp.asarray(np.asarray(u_k, np.float32)),
                   mesh_shape=mesh_shape, name=name)

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def value(self, state: State, system: System) -> jax.Array:
        n = state.pos.shape[0]
        w = self.mode[system.types]
        rho = cic_assign(state.pos, w, state.box, self.mesh_shape)
        rho_k = jnp.fft.fftn(rho)
        return jnp.sum(jnp.abs(rho_k) ** 2 * self.u_k) / n
