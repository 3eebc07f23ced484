"""Orthorhombic simulation box and periodic-boundary math.

Reference parity: HOOMD-blue's ``BoxDim`` (minimum image, wrapping, image
counters used by unwrapped coordinates / the MSD CV).  See SURVEY.md §2b.
Triclinic boxes are an explicit non-goal for now (SURVEY.md §7).

All functions are pure jnp and shape-static so they fuse into the jitted
MD step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Box:
    """Orthorhombic periodic box with edge lengths ``L = (Lx, Ly, Lz)``."""

    L: jax.Array  # (3,) f32

    @property
    def volume(self) -> jax.Array:
        return jnp.prod(self.L)

    @classmethod
    def cubic(cls, L: float) -> "Box":
        # host-side (numpy) on purpose: an eager jnp constructor makes the
        # box device-resident, and any later host read of it (pack_host,
        # spec sizing) becomes a D2H fetch of an eager-op result — measured
        # 50–500 s (!) on the axon remote PJRT tunnel.  NumPy leaves enter
        # jit like any other input and become device arrays at the single
        # device_put of the packed state.
        return cls(L=np.full((3,), L, dtype=np.float32))

    @classmethod
    def from_lengths(cls, Lx: float, Ly: float, Lz: float) -> "Box":
        return cls(L=np.asarray([Lx, Ly, Lz], dtype=np.float32))


def minimum_image(dr: jax.Array, box: Box) -> jax.Array:
    """Minimum-image convention for displacement vectors ``dr`` (..., 3)."""
    L = box.L
    return dr - L * jnp.round(dr / L)


def wrap(pos: jax.Array, box: Box) -> tuple[jax.Array, jax.Array]:
    """Wrap positions into [-L/2, L/2) per axis.

    Returns (wrapped_positions, image_shift) where ``image_shift`` is the
    integer number of box lengths removed — add it to an image counter to
    keep unwrapped coordinates (needed by the MSD collective variable).
    """
    L = box.L
    shift = jnp.floor(pos / L + 0.5).astype(jnp.int32)
    return pos - L * shift.astype(pos.dtype), shift


def unwrap(pos: jax.Array, image: jax.Array, box: Box) -> jax.Array:
    """Reconstruct unwrapped coordinates from wrapped positions + images."""
    return pos + image.astype(pos.dtype) * box.L
