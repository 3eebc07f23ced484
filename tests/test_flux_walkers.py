"""Flux-tempered × multiple walkers + the equilibration-gated update.

Reference parity: the MPI-partition walker mechanism composes with every
metadynamics mode (SURVEY.md §2b MPI-partitions row); the bias rebuild
happens "after equilibration criterion" (§3.4).  WT walkers live in
test_walkers.py; this file covers the FT analog: per-period pooling of
the visit/crossing histograms across replicas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.cv.simple import AxisPosition
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.flux_sampler import FluxTemperedSampler
from metadyn_tpu.integrate.langevin import make_langevin_step

A_WELL = 3.0


def _ft(kT, n_walkers=1, seed=0, **kw):
    # cadence/convergence tests exercise the EXPLICIT opt-out of the
    # equilibration gate (which now defaults ON, min_round_trips=1);
    # the gate tests below override this
    kw.setdefault("min_round_trips", 0)
    def dw(pos, state, system):
        x = pos[0, 0]
        return (A_WELL * (x * x - 1.0) ** 2
                + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2))

    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0, 0]], np.float32),
                       Box.cubic(50.0))
    mesh = None
    if n_walkers > 1:
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_walkers,) + x.shape).copy(),
            state)
        mesh = Mesh(np.asarray(jax.devices()[:n_walkers]), ("walkers",))
    return FluxTemperedSampler(
        system, state, ff.bind(system), cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=GridSpec.create([-1.5], [1.5], [61], [0.1]),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=kT, gamma=2.0),
        kT=kT, stride=50, update_period=100, seed=seed, mesh=mesh, **kw)


@pytest.mark.slow
def test_flux_walkers_converge_faster():
    """8 pooled walkers hit the ≤0.1 kT oracle in 1/4 the per-walker
    steps of the single-walker protocol (test_modes:
    500k transient + 8M measurement): pooling multiplies the statistics
    by W, so the histogram noise at fixed wall-clock shrinks ~1/√W."""
    kT = 0.6
    s = _ft(kT, n_walkers=8, gain_halflife=10)
    x = s.grid_coords()
    F_true = A_WELL * (x ** 2 - 1.0) ** 2
    s.run(125_000)            # transient: 25 updates (1/4 of single-walker)
    s.begin_measurement()
    s.run(2_000_000)          # 1/4 the per-walker measurement steps
    F = s.free_energy()
    m = np.abs(x) <= 1.1
    err = (F - F_true)[m]
    err -= err.mean()
    assert np.max(np.abs(err)) < 0.1, np.max(np.abs(err))
    assert max(h["round_trips"] for h in s.history) >= 1


def test_flux_walkers_pool_histograms():
    """Short run: per-walker histograms differ (independent PRNG
    streams), the pooled update sums them, and the bias builds toward
    the wells just like the single-walker path."""
    kT = 0.6
    s = _ft(kT, n_walkers=4)
    s.run(25_000)             # 5 updates per walker
    fx = s.carry.flux
    assert fx.hist.shape == (4, 61)
    x = s.grid_coords()
    V = np.asarray(s.bias.grid.V)
    assert np.isfinite(V).all()
    well = V[np.abs(np.abs(x) - 1.0) < 0.15].max()
    barrier = V[np.abs(x) < 0.15].max()
    assert well - barrier > 0.3, (well, barrier)
    # walker streams are actually independent: states diverged
    xs = np.asarray(s.carry.state.pos)[:, 0, 0]
    assert np.unique(np.round(xs, 6)).size > 1


def test_flux_equilibration_gate_defers_update():
    """min_round_trips: a cold start (no round trips yet) defers the
    histogram→bias update — the bias stays zero and the histograms keep
    accumulating — until the criterion is met or the defer cap hits."""
    kT = 0.3   # cold: barrier 3.0 ≈ 10 kT, no crossings in one period
    s = _ft(kT, min_round_trips=5, max_defer_periods=3)
    h = s.run(5_000)          # one period
    assert h[-1]["round_trips"] < 5
    assert h[-1]["update_applied"] is False
    assert s.n_updates == 0
    assert float(np.abs(np.asarray(s.bias.grid.V)).max()) == 0.0
    visits_1 = float(np.asarray(s.carry.flux.hist).sum())
    s.run(5_000)              # second period: histograms keep growing
    visits_2 = float(np.asarray(s.carry.flux.hist).sum())
    assert visits_2 > visits_1
    # the cap forces an update eventually (trapped-walker escape hatch)
    s.run(5_000 * 3)
    assert s.n_updates >= 1
    assert float(np.abs(np.asarray(s.bias.grid.V)).max()) > 0.0


def test_flux_gate_open_matches_legacy_cadence():
    """With the criterion immediately satisfied (min_round_trips=1 at a
    hot temperature), every period updates — the legacy fixed-period
    contract is unchanged."""
    kT = 2.0
    s = _ft(kT, min_round_trips=1)
    h = s.run(25_000)         # 5 periods
    assert all(m["update_applied"] for m in h)
    assert s.n_updates == 5


def test_flux_gate_defaults_on():
    """The equilibration criterion is the OUT-OF-THE-BOX behavior
    (SURVEY.md §3.4 "after equilibration criterion"): constructing a
    sampler without the knob gates updates on one pooled round trip."""
    from metadyn_tpu.core.box import Box
    from metadyn_tpu.core.forcefield import ForceField
    from metadyn_tpu.core.state import make_state, make_system
    from metadyn_tpu.integrate.langevin import make_langevin_step

    def dw(pos, state, system):
        x = pos[0, 0]
        return (A_WELL * (x * x - 1.0) ** 2
                + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2))

    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0, 0]], np.float32),
                       Box.cubic(50.0))
    s = FluxTemperedSampler(
        system, state, ff.bind(system),
        cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=GridSpec.create([-1.5], [1.5], [61], [0.1]),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=0.2, gamma=2.0),
        kT=0.2, stride=50, update_period=20, seed=0)
    assert s.min_round_trips == 1
    # a cold start (barrier 3.0 = 15 kT) produces no round trip in one
    # period → the default gate defers the first update
    h = s.run(1_000)
    assert h[-1]["update_applied"] is False
    assert s.n_updates == 0
