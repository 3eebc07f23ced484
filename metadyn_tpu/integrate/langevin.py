"""Langevin dynamics (BAOAB splitting) and NVE velocity Verlet.

Reference parity: HOOMD ``TwoStepLangevin`` (NVT Langevin) and ``TwoStepNVE``
(SURVEY.md §2b).  SURVEY.md §2b explicitly allows BAOAB/GJF in place of
HOOMD's impulse Langevin as long as equilibrium sampling (and hence the FES)
is equivalent — BAOAB has superior configurational accuracy at large dt
(Leimkuhler–Matthews 2013).

Noise uses jax.random (Threefry) with one fold per (step, use) — the
counter-based analog of HOOMD's per-particle Saru stream (SURVEY.md §2b).

Integrators consume an *apply-style* force function
``force_apply(state) -> state`` (forces/energy written into the state) so
the same factories serve every engine family.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.box import wrap
from ..core.state import State, System
from .base import StepFn

ForceApply = Callable[[State], State]


def make_langevin_step(
    force_apply: ForceApply, system: System, dt: float, kT: float,
    gamma: float = 1.0,
) -> StepFn:
    """BAOAB Langevin step: B(dt/2) A(dt/2) O(dt) A(dt/2) [forces] B(dt/2)."""
    mass = system.mass[:, None]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt(1.0 - c1 * c1)

    def step(state: State, key: jax.Array) -> State:
        v = state.vel + 0.5 * dt * state.force / mass          # B
        x = state.pos + 0.5 * dt * v                            # A
        noise = jax.random.normal(key, v.shape, v.dtype)
        v = c1 * v + c2 * jnp.sqrt(kT / mass) * noise           # O
        x = x + 0.5 * dt * v                                    # A
        x, shift = wrap(x, state.box)
        new = force_apply(state.replace(pos=x, image=state.image + shift))
        return new.replace(vel=v + 0.5 * dt * new.force / mass)

    return step


def make_nve_step(force_apply: ForceApply, system: System, dt: float) -> StepFn:
    """Velocity Verlet (NVE) — the HOOMD two-step scheme in one fused fn."""
    mass = system.mass[:, None]

    def step(state: State, key: jax.Array) -> State:
        v_half = state.vel + 0.5 * dt * state.force / mass
        x = state.pos + dt * v_half
        x, shift = wrap(x, state.box)
        new = force_apply(state.replace(pos=x, image=state.image + shift))
        return new.replace(vel=v_half + 0.5 * dt * new.force / mass)

    return step
