"""NPT: Langevin dynamics + stochastic cell rescaling (SCR) barostat.

Reference parity: HOOMD ``TwoStepNPT`` (MTK barostat) — SURVEY.md §2b; the
aspect-ratio CV (box-shape metadynamics) couples bias forces to the box
degrees of freedom here.  We use the stochastic-cell-rescaling barostat of
Bernetti & Bussi (J. Chem. Phys. 153, 114107, 2020): correct NPT sampling,
first-order in dt, no barostat inertia DOF — a good fit for a carry-light
jitted step.

Anisotropic mode integrates Lx, Ly, Lz independently against the TRUE
per-axis internal pressure P_d = (Σ m v_d² + W_d)/V using the diagonal
virial tensor carried in ``state.virial`` (pair/bond/mesh paths all
accumulate per-axis — SURVEY.md §2b IntegratorTwoStep stress tensor);
``box_bias_fn(state) -> (3,) ∂V_bias/∂L`` lets the metadynamics
aspect-ratio bias act on the box.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.box import Box, wrap
from ..core.state import State, System, kinetic_energy
from .base import StepFn
from .langevin import ForceApply


def make_npt_scr_step(
    force_apply: ForceApply,
    system: System,
    dt: float,
    kT: float,
    pressure: float,
    gamma: float = 1.0,
    tau_p: float = 2.0,
    anisotropic: bool = False,
    box_bias_fn: Optional[Callable[[State], jax.Array]] = None,
    kappa: float = 0.1,
) -> StepFn:
    """BAOAB Langevin + per-step stochastic cell rescale.

    ``kappa`` is the isothermal-compressibility estimate (default: LJ
    liquid ~ 0.1 in reduced units); it only sets the barostat time scale,
    not the sampled ensemble — tune it for stiff/soft systems.
    """
    mass = system.mass[:, None]
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt(1.0 - c1 * c1)
    n = system.n

    def step(state: State, key: jax.Array) -> State:
        assert state.box.tilt is None, (
            "NPT cell rescaling requires an orthorhombic box: per-axis L "
            "scaling at fixed tilt is not a componentwise position map")
        k_noise, k_baro = jax.random.split(key)
        # --- Langevin BAOAB on particles ---
        v = state.vel + 0.5 * dt * state.force / mass
        x = state.pos + 0.5 * dt * v
        noise = jax.random.normal(k_noise, v.shape, v.dtype)
        v = c1 * v + c2 * jnp.sqrt(kT / mass) * noise
        x = x + 0.5 * dt * v

        # --- barostat: stochastic cell rescaling ---
        ke = 0.5 * jnp.sum(system.mass[:, None] * v * v)
        vol = state.box.volume
        p_int = (2.0 * ke / 3.0 + jnp.sum(state.virial) / 3.0) / vol
        if anisotropic:
            # per-axis strain against the TRUE per-axis internal pressure
            # P_d = (Σ m v_d² + W_d)/V, plus the box-bias generalized force
            g = jax.random.normal(k_baro, (3,))
            ke2_d = jnp.sum(system.mass[:, None] * v * v, axis=0)
            p_d = (ke2_d + state.virial) / vol
            dP = p_d - pressure
            if box_bias_fn is not None:
                # bias stress along axis d: σ_d = −(1/V)·∂E_bias/∂ε_d
                # = −(∂V/∂L_d)·L_d / V — enters the per-axis pressure
                # imbalance with the same normalization as p_int
                dVdL = box_bias_fn(state)
                dP = dP - dVdL * state.box.L / vol
            eps = (-(kappa * dt / (3.0 * tau_p)) * (-dP)
                   + jnp.sqrt(2.0 * kT * kappa * dt / (3.0 * vol * tau_p)) * g)
        else:
            g = jax.random.normal(k_baro, ())
            eps = (-(kappa * dt / tau_p) * (pressure - p_int)
                   + jnp.sqrt(2.0 * kT * kappa * dt / (vol * tau_p)) * g) / 3.0
        scale = jnp.exp(eps)  # (3,) or scalar
        new_box = Box(L=state.box.L * scale)
        x = x * scale
        v = v / scale

        x, shift = wrap(x, new_box)
        new = force_apply(state.replace(pos=x, image=state.image + shift,
                                        box=new_box))
        return new.replace(vel=v + 0.5 * dt * new.force / mass)

    return step
