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
                         stride=50, W=0.08, deltaT=3.0, seed=0):
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
    )


def _dw_fes_error(kT, transient, n_seg, seg, tmp_hill=None):
    s = _double_well_sampler(tmp_hill=tmp_hill, kT=kT, W=0.15, deltaT=6.0)
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
