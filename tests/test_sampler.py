"""End-to-end metadynamics tests (SURVEY.md §4.4, §4.6).

The double-well oracle: one particle in U(x) = a(x²−1)², CV = x, well-tempered
metadynamics.  At convergence the FES estimate −(T+ΔT)/ΔT·V(s) must recover
U(x) within the 0.1 kT north-star tolerance (BASELINE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system, thermal_velocities
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.cv.simple import AxisPosition
from metadyn_tpu.cv.lamellar import LamellarOP
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.metad import HillSpec, WELL_TEMPERED, STANDARD
from metadyn_tpu.sampler import MetadSampler
from metadyn_tpu.io.hill_log import read_hills, fes_from_hills
from metadyn_tpu.utils.lattice import sc_lattice
from metadyn_tpu.ops.pairs import lj_tables, lj_kernel


A_WELL = 2.0  # barrier height = A_WELL at x=0 vs minima at ±1


def _double_well_sampler(tmp_hill=None, mode=WELL_TEMPERED, kT=0.6,
                         stride=50, W=0.08, deltaT=3.0, seed=0,
                         bias_every=1):
    def dw(pos, state, system):
        x = pos[0, 0]
        return A_WELL * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)

    box = Box.cubic(50.0)  # huge box: x stays far from the boundary
    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0.0, 0.0]], np.float32), box)
    hills = HillSpec.create(W=W, stride=stride, mode=mode, deltaT=deltaT)
    grid = GridSpec.create([-1.6], [1.6], [161], [0.1])
    return MetadSampler(
        system, state, ff.bind(system),
        cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=grid, hills=hills,
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=kT, gamma=5.0),
        seed=seed, hill_file=tmp_hill, overwrite=True,
        bias_every=bias_every,
    )


def _dw_fes_error(kT, transient, n_seg, seg, tmp_hill=None, bias_every=1):
    s = _double_well_sampler(tmp_hill=tmp_hill, kT=kT, W=0.15, deltaT=6.0,
                             bias_every=bias_every)
    x = s.grid_coords(0)
    F_true = A_WELL * (x**2 - 1.0) ** 2
    s.run(transient)
    F_acc = np.zeros_like(x)
    for _ in range(n_seg):
        s.run(seg)
        F_acc += s.free_energy(kT=kT)
    F = F_acc / n_seg
    m = np.abs(x) <= 1.2  # region the walker samples well
    err = (F - F_true)[m]
    err -= err.mean()  # FES defined up to a constant
    return np.max(np.abs(err))


@pytest.mark.slow
def test_double_well_fes_oracle(tmp_path):
    """Well-tempered FES converges to the analytic double well ≤ 0.1 kT
    (BASELINE.md north-star tolerance).  Protocol: fill transient, then
    time-average the WT estimator — the standard variance-reduction for
    WT-MTD (the instantaneous estimator oscillates with each hill)."""
    kT = 0.6
    err = _dw_fes_error(kT, 400_000, 16, 100_000,
                        tmp_hill=str(tmp_path / "HILLS"))
    assert err < 0.1 * kT, err


def test_double_well_fes_oracle_fast(tmp_path):
    """Short-protocol version of the FES oracle for the default suite
    (the ≤0.1 kT claim is the slow-marked test above)."""
    kT = 0.6
    err = _dw_fes_error(kT, 200_000, 4, 50_000)
    assert err < 0.5 * kT, err


def test_double_well_fes_mts_bias_every():
    """Multiple-time-stepped bias force (constant-hold MTS): the FES
    oracle converges to the same quality as the every-step path — the
    sampled ensemble is preserved when the bias force is held over a few
    MD steps (PLUMED MULTIPLE_TIME_STEP; Ferrarotti et al. 2015).

    Validity scale: the hold displacement must stay below the hill width
    (here D=kT/γ=0.12 ⇒ 2 steps ≈ 0.05 ≈ σ/2; holding for 5 steps ≈ a
    full σ measurably degrades this toy's FES — the diffusive 1-particle
    toy is MTS's worst case, condensed-phase CVs evolve far slower)."""
    kT = 0.6
    err = _dw_fes_error(kT, 200_000, 4, 50_000, bias_every=2)
    assert err < 0.5 * kT, err


def test_hill_log_and_offline_reconstruction(tmp_path):
    kT = 0.6
    hill_file = str(tmp_path / "HILLS")
    s = _double_well_sampler(tmp_hill=hill_file, kT=kT)
    s.run(20_000)
    h = read_hills(hill_file)
    assert h["step"].shape[0] == 400
    assert h["cv_names"] == ["cv_x"]
    np.testing.assert_allclose(h["sigma"], 0.1)
    assert np.all(h["height"] > 0) and np.all(h["height"] <= 0.08 + 1e-6)
    # offline sum_hills reconstruction matches the on-device grid
    x = s.grid_coords(0)
    F_off = fes_from_hills(hill_file, [x], mode="well_tempered",
                           kT=kT, deltaT=3.0)
    F_dev = s.free_energy(kT=kT)
    m = np.abs(x) <= 1.3
    np.testing.assert_allclose(F_off[m] - F_off[m].mean(),
                               F_dev[m] - F_dev[m].mean(), atol=2e-2)


def test_metrics_and_resume_determinism(tmp_path):
    """Same seed, split runs == one run (PRNG key discipline, SURVEY.md §4.6)."""
    s1 = _double_well_sampler(seed=7)
    s1.run(2000)
    V1 = np.asarray(s1.bias.grid.V)
    p1 = np.asarray(s1.state.pos)

    # bitwise: identical call pattern must reproduce exactly
    s3 = _double_well_sampler(seed=7)
    s3.run(2000)
    np.testing.assert_array_equal(V1, np.asarray(s3.bias.grid.V))
    np.testing.assert_array_equal(p1, np.asarray(s3.state.pos))

    # split calls: same trajectory up to XLA re-fusion across scan lengths
    s2 = _double_well_sampler(seed=7)
    for _ in range(4):
        s2.run(500)
    np.testing.assert_allclose(V1, np.asarray(s2.bias.grid.V), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p1, np.asarray(s2.state.pos), rtol=1e-4, atol=1e-5)
    m = s2.history[-1]
    for k in ("cv", "bias_V", "temperature", "hill_height", "potential_energy"):
        assert np.all(np.isfinite(m[k])), k
    assert not m["cv_out_of_grid"]


def test_config1_lj_lamellar_standard():
    """Config 1 (BASELINE.json:7): LJ N=1024, NVT Langevin, 1D lamellar CV,
    standard metadynamics — runs end-to-end, bias accumulates, stays finite."""
    n_side = 11  # 1331 > 1024; take first 1024 of a jittered lattice
    rng = np.random.default_rng(0)
    L = 11.0
    pos = sc_lattice(n_side, L / n_side)[:1024]
    pos += rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32)
    box = Box.cubic(L)
    system = make_system(1024)
    ff = ForceField(pair_params=lj_tables(1, r_cut=2.5), pair_kernel=lj_kernel,
                    row_block=256)
    key = jax.random.PRNGKey(1)
    state = make_state(pos, box, vel=thermal_velocities(key, system.mass, 1.5))
    cv = LamellarOP.create(mode=[1.0], lattice_vectors=[[0, 0, 1]])
    s = MetadSampler(
        system, state, ff.bind(system), cvs=[cv],
        grid_spec=GridSpec.create([-0.5], [0.5], [101], [0.02]),
        hills=HillSpec.create(W=0.2, stride=25, mode=STANDARD),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.004, kT=1.5, gamma=1.0),
        seed=3,
    )
    hist = s.run(150)
    assert len(hist) == 6
    V = np.asarray(s.bias.grid.V)
    assert np.all(np.isfinite(V)) and V.max() > 0.1
    assert all(np.isfinite(m["cv"]).all() for m in hist)
    assert int(s.bias.n_hills) == 6


def _dw_list_sampler(kT=0.6, capacity=4096, spill_grid=None, seed=0):
    def dw(pos, state, system):
        x = pos[0, 0]
        return A_WELL * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)

    box = Box.cubic(50.0)
    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0.0, 0.0]], np.float32), box)
    hills = HillSpec.create(W=0.15, stride=50, mode=WELL_TEMPERED, deltaT=6.0)
    return MetadSampler(
        system, state, ff.bind(system),
        cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=None, hills=hills,
        hill_sigma=[0.1], hill_capacity=capacity, spill_grid=spill_grid,
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=kT, gamma=5.0),
        seed=seed,
    )


def test_hill_list_deposit_parity_with_grid():
    """Identical deposit sequences produce identical bias fields: the grid
    stores each hill evaluated exactly at the grid points, so V at grid
    points must match the analytic hill-list sum to f32 rounding
    (VERDICT r1 item 6; SURVEY.md §3.1 non-grid mode)."""
    from metadyn_tpu.bias.metad import BiasState, deposit
    from metadyn_tpu.bias.hill_list import HillListBias, evaluate_on_grid
    spec = GridSpec.create([-1.6], [1.6], [161], [0.1])
    hills = HillSpec.create(W=0.15, stride=50, mode=WELL_TEMPERED, deltaT=6.0)
    bg = BiasState.zeros(spec)
    bl = HillListBias.create([0.1], capacity=64)
    rng = np.random.default_rng(3)
    centers = rng.uniform(-1.2, 1.2, 50).astype(np.float32)
    for i, c in enumerate(centers):
        s = jnp.asarray([c])
        bg, rg = deposit(hills, bg, s, jnp.int32(i))
        bl, rl = deposit(hills, bl, s, jnp.int32(i))
        # WT height uses V(s) interpolated (grid) vs analytic (list):
        # tiny interpolation differences allowed
        np.testing.assert_allclose(float(rg.height), float(rl.height),
                                   rtol=2e-3)
    V_g = np.asarray(bg.grid.V)
    V_l = np.asarray(evaluate_on_grid(bl, spec))
    # heights drifted apart by the WT interpolation differences above;
    # compare fields to that tolerance
    np.testing.assert_allclose(V_g, V_l, atol=5e-3)
    assert int(bl.n_hills) == 50 and not bool(bl.overflowed)


def test_hill_list_mode_end_to_end_fes():
    """Full list-mode WT run on the double well recovers the same FES as
    grid mode (loose tolerance: the modes' trajectories diverge
    chaotically; the deterministic parity is the deposit test above)."""
    kT = 0.6
    sg = _double_well_sampler(kT=kT, W=0.15, deltaT=6.0)
    sl = _dw_list_sampler(kT=kT)
    sg.run(5000)
    sl.run(5000)
    eval_spec = sg.grid_spec
    F_g = sg.free_energy(kT=kT)
    F_l = sl.free_energy(kT=kT, eval_spec=eval_spec)
    x = sg.grid_coords(0)
    m = np.abs(x) <= 1.2
    d = (F_g - F_l)[m]
    d -= d.mean()
    assert np.max(np.abs(d)) < 0.15, np.max(np.abs(d))
    assert int(sl.bias.n_hills) == 100
    assert not bool(sl.bias.overflowed)


@pytest.mark.smoke
def test_hill_list_spill_to_grid():
    """Past capacity, hills spill onto the coarse grid: total bias is
    preserved (no overflow flag) and the FES still matches a big-buffer
    run within spill-grid interpolation error."""
    kT = 0.6
    spill = GridSpec.create([-1.6], [1.6], [161], [0.1])
    s_small = _dw_list_sampler(kT=kT, capacity=40, spill_grid=spill)
    s_big = _dw_list_sampler(kT=kT, capacity=4096)
    s_small.run(5000)   # 100 hills: 40 in buffer + 60 spilled
    s_big.run(5000)
    assert int(s_small.bias.n_hills) == 100
    assert not bool(s_small.bias.overflowed)
    eval_spec = spill
    F_s = s_small.free_energy(kT=kT, eval_spec=eval_spec)
    F_b = s_big.free_energy(kT=kT, eval_spec=eval_spec)
    x = np.asarray(eval_spec.axis_coords(0))
    m = np.abs(x) <= 1.2
    d = (F_s - F_b)[m]
    d -= d.mean()
    assert np.max(np.abs(d)) < 0.05, np.max(np.abs(d))


def test_hill_list_overflow_flag_without_spill():
    s = _dw_list_sampler(kT=0.6, capacity=10)
    s.run(1000)  # 20 hills > capacity 10, no spill grid
    assert int(s.bias.n_hills) == 20
    assert bool(s.bias.overflowed)
    assert bool(s.history[-1]["cv_out_of_grid"])  # surfaced in metrics


def _dw2d_sampler(kT, seed=0):
    def dw2(pos, state, system):
        x, y = pos[0, 0], pos[0, 1]
        return (A_WELL * (x * x - 1.0) ** 2 + A_WELL * (y * y - 1.0) ** 2
                + 5.0 * pos[0, 2] ** 2)

    system = make_system(1)
    ff = ForceField(external=dw2)
    state = make_state(np.asarray([[1.0, -1.0, 0.0]], np.float32),
                       Box.cubic(50.0))
    grid = GridSpec.create([-1.6, -1.6], [1.6, 1.6], [65, 65], [0.1, 0.1])
    return MetadSampler(
        system, state, ff.bind(system),
        cvs=[AxisPosition(0, 0, name="x"), AxisPosition(0, 1, name="y")],
        grid_spec=grid,
        hills=HillSpec.create(W=0.12, stride=50, mode=WELL_TEMPERED,
                              deltaT=4.0),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=kT, gamma=3.0),
        seed=seed, chunks_per_block=64)


@pytest.mark.slow
def test_double_well_2d_fes_oracle():
    """2-D WT metadynamics hits the ≤0.1 kT north star (BASELINE.md,
    VERDICT r2 weak #3): 8 walkers flatten the double-double-well, then
    the measurement phase accumulates the per-step CV visit histogram on
    device and F̂ = −V̄ − kT·ln h (WalkerSampler.free_energy) — exact for
    the slowly-varying late-WT bias, so the error is pure counting noise
    ∝ 1/sqrt(T_phys).  Protocol calibrated by sweep: dt=0.02 (the toy is
    BAOAB-stable far beyond this; 4× the physical time of dt=0.005 per
    step), γ=1 (short CV correlation time); raw histogram — mild Gaussian
    smoothing was measured to FLOOR at ~0.12 kT (σ=0.05 smoothing bias),
    while the raw estimate kept falling: 0.122 kT at 2.4M steps → ~0.08
    at 6M.  The plain −V WT estimator measures 0.12 kT on this grid
    (round-2 ceiling)."""
    from metadyn_tpu.parallel.walkers import WalkerSampler

    kT = 0.6

    def dw2(pos, state, system):
        x, y = pos[0, 0], pos[0, 1]
        return (A_WELL * (x * x - 1.0) ** 2 + A_WELL * (y * y - 1.0) ** 2
                + 5.0 * pos[0, 2] ** 2)

    system = make_system(1)
    ff = ForceField(external=dw2)
    box = Box.cubic(50.0)
    starts = np.asarray(
        [[1.0 - 2.0 * (w % 2), 1.0 - 2.0 * ((w // 2) % 2), 0.0]
         for w in range(8)], np.float32)
    states = jax.vmap(lambda p: make_state(p[None, :], box))(
        jnp.asarray(starts))
    grid = GridSpec.create([-1.6, -1.6], [1.6, 1.6], [65, 65], [0.1, 0.1])
    s = WalkerSampler(
        system, states, ff.bind(system),
        cvs=[AxisPosition(0, 0, name="x"), AxisPosition(0, 1, name="y")],
        grid_spec=grid,
        hills=HillSpec.create(W=0.12, stride=50, mode=WELL_TEMPERED,
                              deltaT=4.0),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.02, kT=kT, gamma=1.0),
        seed=0, chunks_per_block=64, measure_cv_hist=True)
    x = np.asarray(grid.axis_coords(0))
    X, Y = np.meshgrid(x, x, indexing="ij")
    F_true = A_WELL * (X ** 2 - 1) ** 2 + A_WELL * (Y ** 2 - 1) ** 2
    s.run(50_000)              # transient: wells flattened, WT gain low
    s.begin_measurement()
    s.run(6_000_000)
    F = s.free_energy(kT)
    m = (np.abs(X) <= 1.15) & (np.abs(Y) <= 1.15)
    err = F[m] - F_true[m]
    err -= err.mean()
    assert np.max(np.abs(err)) < 0.1 * kT, np.max(np.abs(err)) / kT


def test_double_well_2d_fes_fast():
    """Default-suite 2-D smoke: bias covers all four wells."""
    kT = 0.6
    s = _dw2d_sampler(kT)
    s.run(100_000)
    V = np.asarray(s.bias.grid.V)
    x = np.asarray(s.grid_spec.axis_coords(0))
    X, Y = np.meshgrid(x, x, indexing="ij")
    assert np.isfinite(V).all()
    for sx in (-1, 1):
        for sy in (-1, 1):
            well = V[(np.abs(X - sx) < 0.2) & (np.abs(Y - sy) < 0.2)]
            assert well.max() > 0.3, (sx, sy)


def test_add_hills_false_freezes_bias(tmp_path):
    """``add_hills=False`` (reference ``mode_metadynamics(add_hills=False)``):
    the bias exerts forces but never changes — production sampling on a
    converged FES.  The frozen grid must be bitwise-identical after the
    run, no hill file is written, and the bias force demonstrably steers
    the trajectory (same seed, with vs without the seeded bias)."""
    # phase 1: deposit some bias
    s1 = _double_well_sampler(stride=50, W=0.3, deltaT=6.0, seed=3)
    s1.run(2000)
    seeded = s1.bias
    assert int(seeded.n_hills) == 40

    def frozen(initial_bias, hill_file=None):
        box = Box.cubic(50.0)
        system = make_system(1)

        def dw(pos, state, system):
            x = pos[0, 0]
            return (A_WELL * (x * x - 1.0) ** 2
                    + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2))

        ff = ForceField(external=dw)
        state = make_state(np.asarray([[1.0, 0.0, 0.0]], np.float32), box)
        return MetadSampler(
            system, state, ff.bind(system),
            cvs=[AxisPosition(0, 0, name="x")],
            grid_spec=GridSpec.create([-1.6], [1.6], [161], [0.1]),
            hills=HillSpec.create(W=0.3, stride=50, mode=WELL_TEMPERED,
                                  deltaT=6.0),
            integrator_factory=lambda f: make_langevin_step(
                f, system, dt=0.005, kT=0.6, gamma=5.0),
            seed=7, add_hills=False, initial_bias=initial_bias,
            hill_file=hill_file, overwrite=True)

    hf = str(tmp_path / "HILLS_frozen")
    s2 = frozen(seeded, hill_file=hf)
    hist = s2.run(1000)
    # bias bitwise-frozen, hill counter untouched, no hill rows written
    assert np.array_equal(np.asarray(s2.bias.grid.V),
                          np.asarray(seeded.grid.V))
    assert int(s2.bias.n_hills) == int(seeded.n_hills)
    assert all(float(m["hill_height"]) == 0.0 for m in hist)
    assert not (tmp_path / "HILLS_frozen").exists()
    # the frozen bias still steers: same seed without bias ends elsewhere
    s3 = frozen(None)
    s3.run(1000)
    x2 = float(s2.state.pos[0, 0])
    x3 = float(s3.state.pos[0, 0])
    assert abs(x2 - x3) > 1e-4
    assert np.isfinite(x2) and np.isfinite(x3)
