"""Multi-walker metadynamics on the 8-virtual-device CPU mesh
(SURVEY.md §4.5 — the same shard_map/psum code runs on a TPU slice)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.cv.simple import AxisPosition
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.metad import HillSpec, WELL_TEMPERED, BiasState, deposit
from metadyn_tpu.parallel.walkers import WalkerSampler
from metadyn_tpu.sampler import MetadSampler


A_WELL = 2.0


def _dw(pos, state, system):
    x = pos[0, 0]
    return A_WELL * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)


def _make_walker_sampler(n_steps_equiv=None, seed=0, stride=25):
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    system = make_system(1)
    ff = ForceField(external=_dw)
    box = Box.cubic(50.0)
    # 8 walkers: half start in each well
    starts = np.asarray([[1.0 - 2.0 * (w % 2), 0, 0] for w in range(8)],
                        np.float32)
    states = jax.vmap(lambda p: make_state(p[None, :], box))(jnp.asarray(starts))
    hills = HillSpec.create(W=0.1, stride=stride, mode=WELL_TEMPERED, deltaT=6.0)
    grid = GridSpec.create([-1.6], [1.6], [161], [0.1])
    return WalkerSampler(
        system, states, ff.bind(system), cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=grid, hills=hills,
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=0.6, gamma=5.0),
        seed=seed,
    )


def test_walkers_share_grid():
    s = _make_walker_sampler()
    out = s.run(250)  # 10 strides × 8 walkers
    assert int(s.bias.n_hills) == 80
    V = np.asarray(s.bias.grid.V)
    assert np.all(np.isfinite(V)) and V.max() > 0.3
    # walkers started in both wells → bias grows on both sides early
    x = np.asarray(s.grid_spec.axis_coords(0))
    left = V[np.abs(x + 1.0) < 0.3].max()
    right = V[np.abs(x - 1.0) < 0.3].max()
    assert left > 0.2 and right > 0.2, (left, right)
    m = out[-1]
    assert np.asarray(m["cv"]).shape == (8, 1)
    assert np.all(np.isfinite(np.asarray(m["temperature"])))


def test_walker_grid_matches_serial_deposits():
    """One shard_map stride with W walkers == W sequential standard-mode
    deposits at the same centers (allreduce-delta semantics)."""
    s = _make_walker_sampler(stride=25)
    hills_std = HillSpec.create(W=0.1, stride=25)  # standard: height const
    s.hills = hills_std
    # rebuild the chunk with standard mode: easiest is a fresh sampler
    system = make_system(1)
    ff = ForceField(external=_dw)
    box = Box.cubic(50.0)
    starts = np.asarray([[1.0 - 2.0 * (w % 2), 0, 0] for w in range(8)],
                        np.float32)
    states = jax.vmap(lambda p: make_state(p[None, :], box))(jnp.asarray(starts))
    ws = WalkerSampler(
        system, states, ff.bind(system), cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=GridSpec.create([-1.6], [1.6], [161], [0.1]), hills=hills_std,
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=0.6, gamma=5.0),
        seed=3,
    )
    out = ws.run(25)
    centers = np.asarray(out[-1]["cv"]).reshape(8, 1)
    # serial reference: deposit the same 8 hills on an empty grid
    ref = BiasState.zeros(ws.grid_spec)
    for c in centers:
        ref, _ = deposit(hills_std, ref, jnp.asarray(c), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(ws.bias.grid.V),
                               np.asarray(ref.grid.V), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ws.bias.grid.dV),
                               np.asarray(ref.grid.dV), rtol=1e-4, atol=1e-5)


def test_walkers_converge_faster_fes(tmp_path):
    """8 walkers reach a usable double-well FES in few wall-clock steps
    (time-averaged WT estimator — the instantaneous one oscillates)."""
    from metadyn_tpu.bias.metad import free_energy
    s = _make_walker_sampler()
    s.run(10_000)  # transient (×8 walkers of hill flux)
    x = np.asarray(s.grid_spec.axis_coords(0))
    F_acc = np.zeros_like(x)
    n_seg = 8
    for _ in range(n_seg):
        s.run(5_000)
        F_acc += np.asarray(free_energy(s.hills, s.bias, jnp.float32(0.6)))
    F = F_acc / n_seg
    F_true = A_WELL * (x ** 2 - 1.0) ** 2
    m = np.abs(x) <= 1.1
    err = (F - F_true)[m]
    err -= err.mean()
    assert np.max(np.abs(err)) < 0.3, np.max(np.abs(err))
