"""Integrators for the packed (slot-layout) state — SoA (3, Npad) math.

Same BAOAB/velocity-Verlet schemes as integrate/langevin.py, operating on
the packed hot-path layout (ops/packed.py).  Vacant slots integrate harmless
zeros (ε=0 ⇒ zero force; noise on vacant slots never couples to physics).
Uniform particle mass for now (all baseline configs are unit-mass).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.packed import PackedState, PackedSpec

PackedStepFn = Callable[[PackedState, jax.Array], PackedState]


def _wrap_packed(state: PackedState) -> PackedState:
    L = state.box.L[:, None]
    shift = jnp.floor(state.r / L + 0.5)
    return state.replace(
        r=state.r - L * shift,
        image=state.image + shift.astype(jnp.int32),
    )


# NOTE: packed integrators do NOT wrap per step.  Wrapping teleports a
# coordinate by ±L while the slot cell still implies the old side, making
# the particle a ghost to every neighbor until the next repack (observed:
# rare deep pair overlaps at the box faces → explosions).  Positions drift
# continuously (≤ half-skin outside the box at most) and ops/packed.repack*
# wraps atomically with the slot migration.


def make_packed_langevin_step(
    force_fn: Callable[[PackedState], PackedState],
    dt: float, kT: float, gamma: float = 1.0, mass: float = 1.0,
) -> PackedStepFn:
    """BAOAB Langevin on packed state (cf. integrate/langevin.py)."""
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * kT / mass)

    def step(state: PackedState, key: jax.Array) -> PackedState:
        v = state.v + (0.5 * dt / mass) * state.f
        r = state.r + 0.5 * dt * v
        noise = jax.random.normal(key, v.shape, v.dtype)
        v = c1 * v + c2 * noise
        r = r + 0.5 * dt * v
        state = force_fn(state.replace(r=r))
        return state.replace(v=v + (0.5 * dt / mass) * state.f)

    return step


def make_packed_nve_step(
    force_fn: Callable[[PackedState], PackedState],
    dt: float, mass: float = 1.0,
) -> PackedStepFn:
    def step(state: PackedState, key: jax.Array) -> PackedState:
        v_half = state.v + (0.5 * dt / mass) * state.f
        state = force_fn(state.replace(r=state.r + dt * v_half))
        return state.replace(v=v_half + (0.5 * dt / mass) * state.f)

    return step
