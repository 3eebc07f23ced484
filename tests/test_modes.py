"""P7 tests: NVT thermostats, NPT barostat, aspect-ratio CV, flux-tempered."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import (
    make_state, make_system, thermal_velocities, temperature, pressure,
)
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.integrate.nvt import make_nvt_nh_step, make_nvt_bdp_step
from metadyn_tpu.integrate.npt import make_npt_scr_step
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.cv.aspect_ratio import AspectRatio
from metadyn_tpu.cv.simple import AxisPosition
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.flux import (
    FluxState, accumulate, update_bias, bin_of,
)
from metadyn_tpu.bias.metad import BiasState, HillSpec, WallSpec, WELL_TEMPERED
from metadyn_tpu.flux_sampler import FluxTemperedSampler
from metadyn_tpu.ops.pairs import lj_tables, wca_tables, lj_kernel
from metadyn_tpu.utils.lattice import fcc_lattice

A_WELL = 2.0


def _lj_setup(key, kT=1.0, n_cells=3, a=1.7):
    pos = fcc_lattice(n_cells, a)
    box = Box.cubic(n_cells * a)
    system = make_system(pos.shape[0])
    ff = ForceField(pair_params=wca_tables(1), pair_kernel=lj_kernel,
                    row_block=128)
    force_apply = ff.bind(system)
    state = make_state(pos, box, vel=thermal_velocities(key, system.mass, kT))
    return system, force_apply(state), force_apply


@pytest.mark.parametrize("maker", [make_nvt_nh_step, make_nvt_bdp_step])
def test_nvt_thermostats_equipartition(key, maker):
    kT = 1.1
    system, state, force_apply = _lj_setup(key, kT)
    step = maker(force_apply, system, dt=0.004, kT=kT, tau=0.3)
    state = jax.jit(lambda s: run_steps(step, s, key, 1000))(state)
    temps = []
    for i in range(8):
        state = jax.jit(lambda s, k: run_steps(step, s, k, 100))(
            state, jax.random.PRNGKey(i))
        temps.append(float(temperature(state, system)))
    assert abs(np.mean(temps) - kT) / kT < 0.1, temps


def test_npt_scr_targets_pressure(key):
    kT, P = 1.2, 1.0
    system, state, force_apply = _lj_setup(key, kT, n_cells=4, a=1.75)
    step = make_npt_scr_step(force_apply, system, dt=0.004, kT=kT,
                             pressure=P, gamma=2.0, tau_p=1.0)
    state = jax.jit(lambda s: run_steps(step, s, key, 1500))(state)
    ps, vols = [], []
    for i in range(8):
        state = jax.jit(lambda s, k: run_steps(step, s, k, 125))(
            state, jax.random.PRNGKey(50 + i))
        ps.append(float(pressure(state, system)))
        vols.append(float(state.box.volume))
    p_mean = np.mean(ps)
    assert abs(p_mean - P) < 0.45, (p_mean, ps)
    assert np.std(vols) > 0  # box actually breathes


def test_npt_anisotropic_runs(key):
    kT, P = 1.0, 0.5
    system, state, force_apply = _lj_setup(key, kT)
    cv = AspectRatio()
    bias = BiasState.zeros(GridSpec.create([0.5], [2.0], [51], [0.05]))
    step = make_npt_scr_step(
        force_apply, system, dt=0.004, kT=kT, pressure=P, gamma=2.0,
        tau_p=1.0, anisotropic=True,
        box_bias_fn=lambda st: jnp.zeros(3))
    state2 = jax.jit(lambda s: run_steps(step, s, key, 500))(state)
    L = np.asarray(state2.box.L)
    assert np.all(np.isfinite(L)) and np.all(L > 0)
    s = float(cv.value(state2, system))
    assert 0.3 < s < 3.0
    # aspect CV box-gradient sanity
    g = np.asarray(cv.dvalue_dL(state2))
    eps = 1e-3
    Lp = state2.box.L.at[0].add(eps)
    s2 = float(Lp[0] / Lp[1])
    np.testing.assert_allclose(g[0], (s2 - s) / eps, rtol=1e-3)


def test_flux_accumulate_and_update():
    spec = GridSpec.create([-1.0], [1.0], [20], [0.1])
    fx = FluxState.zeros(spec)
    for s in [-0.9, -0.5, 0.0, 0.5, 0.9, 0.5, 0.0, -0.5]:
        fx = accumulate(fx, spec, jnp.asarray([s]))
    h = np.asarray(fx.hist)
    assert h.sum() == 8
    assert float(fx.flux_up.sum()) == 4 and float(fx.flux_down.sum()) == 3
    bias = BiasState.zeros(spec)
    bias2, fx2 = update_bias(bias, fx, kT=1.0)
    V = np.asarray(bias2.grid.V)
    assert np.asarray(fx2.hist).sum() == 0  # reset
    # more-visited bins got more bias
    b_twice = int(bin_of(spec, jnp.asarray([0.5])))
    b_once = int(bin_of(spec, jnp.asarray([0.9])))
    assert V[b_twice] > V[b_once]
    # unvisited bins become relatively attractive (pseudocount update)
    assert V[0] < 0.0


def _ft_sampler(kT, gamma=5.0, gain_halflife=20, bias_every=1,
                min_round_trips=0):
    # legacy ungated cadence (the equilibration gate now defaults ON):
    # these tests assert per-period update counts, so opt out explicitly

    def dw(pos, state, system):
        x = pos[0, 0]
        return A_WELL * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)

    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0, 0]], np.float32), Box.cubic(50.0))
    return FluxTemperedSampler(
        system, state, ff.bind(system), cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=GridSpec.create([-1.5], [1.5], [61], [0.1]),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=kT, gamma=gamma),
        kT=kT, stride=50, update_period=100, seed=0,
        gain_halflife=gain_halflife, bias_every=bias_every,
        min_round_trips=min_round_trips,
    )


@pytest.mark.slow
def test_flux_tempered_double_well_converges():
    """FT-MTD on the double well recovers F to the ≤0.1 kT north star
    (BASELINE.md), via the reweighted estimator: transient flux updates
    flatten the landscape (gain → 0), then begin_measurement() accumulates
    the visit histogram and F̂ = −V̄ − kT·ln h — exact for any residual
    bias error, noise ∝ 1/sqrt(T).  The plain −V estimate random-walks at
    ~0.25 kT under the same protocol (measured, 3 seeds); reweighting
    measures 0.084/0.069/0.049 kT (seeds 0–2).  γ=2 shortens the CV
    correlation time τ ≈ L²γ/2kT vs the γ=5 default — halves the
    histogram noise for the same wall clock."""
    kT = 0.6
    s = _ft_sampler(kT, gamma=2.0, gain_halflife=10)
    x = s.grid_coords()
    F_true = A_WELL * (x ** 2 - 1.0) ** 2
    s.run(500_000)  # transient: 100 updates, gain → 0.045
    s.begin_measurement()
    s.run(8_000_000)
    F = s.free_energy()
    m = np.abs(x) <= 1.1
    err = (F - F_true)[m]
    err -= err.mean()
    assert np.max(np.abs(err)) < 0.1, np.max(np.abs(err))
    assert max(h["round_trips"] for h in s.history) >= 1


def test_flux_tempered_double_well_fast():
    """Short FT run: bias accumulates in the right direction (full
    convergence is the slow-marked oracle above)."""
    kT = 0.6
    s = _ft_sampler(kT)
    s.run(100_000)  # 20 updates
    x = s.grid_coords()
    V = np.asarray(s.bias.grid.V)
    assert np.all(np.isfinite(V))
    # wells received more bias than the barrier top (V offset is arbitrary)
    well = V[np.abs(np.abs(x) - 1.0) < 0.15].max()
    barrier = V[np.abs(x) < 0.15].max()
    assert well - barrier > 0.5, (well, barrier)
    assert max(h["round_trips"] for h in s.history) >= 1


def test_flux_tempered_bias_every_mts():
    """Flux mode with bias-force multiple-time-stepping: the CV sweep runs
    once per ``bias_every`` steps (the histograms subsample at the same
    cadence — the update rule only consumes h/⟨h⟩, f/⟨f⟩ ratios) and the
    bias still builds toward the wells like the per-step path."""
    kT = 0.6
    s = _ft_sampler(kT, bias_every=5)
    s.run(100_000)  # 20 updates
    x = s.grid_coords()
    V = np.asarray(s.bias.grid.V)
    assert np.all(np.isfinite(V))
    well = V[np.abs(np.abs(x) - 1.0) < 0.15].max()
    barrier = V[np.abs(x) < 0.15].max()
    assert well - barrier > 0.5, (well, barrier)
    # histogram subsampling: one count per CV evaluation, not per step
    s.begin_measurement()
    s.run(5_000)                       # one period = 50 × 100 steps
    assert float(s._meas_h.sum()) == 5_000 / 5
    assert max(h["round_trips"] for h in s.history) >= 1


@pytest.mark.smoke
def test_npt_with_mesh_bias_pressure_consistent(key):
    """NPT + mesh-CV bias: with the k-space bias virial included in
    state.virial (VERDICT r1 item 7, SURVEY.md §3.3), the barostat
    equilibrates where the FULL internal pressure (pair + bias virial)
    matches the external pressure."""
    from metadyn_tpu.cv.mesh import MeshOrderParameter
    from metadyn_tpu.sampler import make_biased_force, _CallableEngine
    from metadyn_tpu.bias.grid import BiasGrid

    kT, P = 1.2, 1.0
    system, state, force_apply = _lj_setup(key, kT, n_cells=4, a=1.75)
    L0 = float(state.box.L[0])
    cv = MeshOrderParameter.create((12, 12, 12), L0, mode=[1.0],
                                   k0=2.0 * np.pi * 2 / L0, width=0.6)
    # a LINEAR standing bias dV/ds = const > 0 (repulsive in s): encode it
    # as a 1-point-slope grid so make_biased_force applies force + virial
    spec1 = GridSpec.create([-100.0], [300.0], [2], [1.0])
    slope = 0.5
    grid = BiasGrid(spec=spec1,
                    V=jnp.asarray([-100.0 * slope, 300.0 * slope]),
                    dV=jnp.full((1, 2), slope))
    bias = BiasState(grid=grid, n_hills=jnp.int32(0))
    biased = make_biased_force(_CallableEngine(force_apply, system),
                               [cv], system)

    def fa(st):
        return biased(st, None, bias)

    step = make_npt_scr_step(fa, system, dt=0.004, kT=kT,
                             pressure=P, gamma=2.0, tau_p=1.0)
    state = fa(state)
    state = jax.jit(lambda s: run_steps(step, s, key, 1500))(state)
    ps, vols, wb = [], [], []
    for i in range(8):
        state = jax.jit(lambda s, k: run_steps(step, s, k, 125))(
            state, jax.random.PRNGKey(70 + i))
        ps.append(float(pressure(state, system)))
        vols.append(float(state.box.volume))
        s_val = cv.value(state, system)
        wb.append(float(np.asarray(
            cv.bias_virial(state, system, jnp.float32(slope))).sum()))
    p_mean = np.mean(ps)
    # full internal pressure (incl. bias virial, which is inside
    # state.virial via make_biased_force) must track the barostat target
    assert abs(p_mean - P) < 0.45, (p_mean, ps)
    assert np.all(np.isfinite(vols))
    # the bias virial is actually nonzero in this run (the test would be
    # vacuous otherwise)
    assert np.max(np.abs(wb)) > 1e-3, wb


@pytest.mark.slow
@pytest.mark.smoke
def test_box_shape_metadynamics_end_to_end(key):
    """Box-shape metadynamics (VERDICT r1 item 4): WT hills deposited on
    s = Lx/Ly, ∂V/∂s coupled to the box DOF through box_bias_fn inside
    the jitted chunk with the anisotropic SCR barostat.  The biased run
    must explore a much wider aspect-ratio range than the unbiased one."""
    from metadyn_tpu.cv.aspect_ratio import box_bias_fn_for
    from metadyn_tpu.sampler import MetadSampler

    kT, P = 1.0, 0.5
    system, state, force_apply = _lj_setup(key, kT)
    cv = AspectRatio()
    gs = GridSpec.create([0.7], [1.4], [71], [0.02])

    def factory(f, bias):
        return make_npt_scr_step(
            f, system, dt=0.004, kT=kT, pressure=P, gamma=2.0,
            tau_p=1.0, anisotropic=True,
            box_bias_fn=box_bias_fn_for(cv, bias))

    smp = MetadSampler(
        system, state, force_apply, cvs=[cv], grid_spec=gs,
        hills=HillSpec.create(W=0.15, stride=25, mode=WELL_TEMPERED,
                              deltaT=4.0),
        integrator_factory=factory, seed=0,
        walls=WallSpec.at_grid_edges(gs, k=500.0))
    smp.run(4000)
    s_biased = np.asarray([float(h["cv"][0]) for h in smp.history])

    # unbiased reference: same barostat, zero box bias
    step0 = make_npt_scr_step(force_apply, system, dt=0.004, kT=kT,
                              pressure=P, gamma=2.0, tau_p=1.0,
                              anisotropic=True)
    st0 = force_apply(state)
    s_unb = []
    for i in range(40):
        st0 = jax.jit(lambda s, k: run_steps(step0, s, k, 100))(
            st0, jax.random.PRNGKey(100 + i))
        s_unb.append(float(st0.box.L[0] / st0.box.L[1]))
    s_unb = np.asarray(s_unb)

    assert np.isfinite(s_biased).all()
    assert int(smp.bias.n_hills) == 160
    assert np.asarray(smp.bias.grid.V).max() > 0.1  # hills really deposited
    spread_b = s_biased.max() - s_biased.min()
    spread_u = s_unb.max() - s_unb.min()
    # the bias drives the box shape far beyond thermal fluctuation
    assert spread_b > 2.0 * spread_u, (spread_b, spread_u)
    assert spread_b > 0.2, spread_b
