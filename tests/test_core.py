"""P1 core tests: box math, pair forces vs autodiff, physics invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box, minimum_image, wrap, unwrap
from metadyn_tpu.core.state import (
    make_state, make_system, thermal_velocities, kinetic_energy, temperature,
)
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.ops.pairs import (
    lj_tables, lj_kernel, wca_tables, soft_tables, soft_kernel, all_pairs_force,
)
from metadyn_tpu.ops.bonds import (
    HarmonicBondParams, FENEBondParams, harmonic_bond_force, fene_bond_force,
)
from metadyn_tpu.integrate.langevin import make_langevin_step, make_nve_step
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.utils.lattice import sc_lattice, fcc_lattice, polymer_melt


def test_wrap_unwrap_roundtrip():
    box = Box.cubic(10.0)
    pos = jnp.asarray([[5.1, -17.3, 0.2], [4.99, -5.0, 23.0]], jnp.float32)
    wrapped, shift = wrap(pos, box)
    assert jnp.all(wrapped >= -5.0) and jnp.all(wrapped < 5.0)
    np.testing.assert_allclose(unwrap(wrapped, shift, box), pos, rtol=1e-6)


def test_minimum_image():
    box = Box.from_lengths(10.0, 20.0, 30.0)
    dr = jnp.asarray([[9.0, -19.0, 16.0]], jnp.float32)
    mi = minimum_image(dr, box)
    np.testing.assert_allclose(mi, [[-1.0, 1.0, -14.0]], atol=1e-5)


def _random_fluid(n=64, L=6.0, seed=0):
    rng = np.random.default_rng(seed)
    # jittered lattice avoids overlapping LJ pairs
    m = int(np.ceil(n ** (1 / 3)))
    pos = sc_lattice(m, L / m)[:n] + rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    return pos, Box.cubic(L)


@pytest.mark.parametrize("kernel,tables", [
    (lj_kernel, lambda T: lj_tables(T, r_cut=2.5)),
    (lj_kernel, lambda T: wca_tables(T)),
    (soft_kernel, lambda T: soft_tables(T, A=25.0, r_cut=1.0)),
])
def test_pair_force_matches_autodiff(kernel, tables):
    """Force oracle (SURVEY.md §4.1): analytic forces == −∇E."""
    pos_np, box = _random_fluid(48, L=5.0)
    types = jnp.zeros(48, jnp.int32)
    params = tables(1)

    def energy(p):
        return all_pairs_force(p, types, box, kernel, params, row_block=16).energy

    res = all_pairs_force(jnp.asarray(pos_np), types, box, kernel, params, row_block=16)
    f_ad = -jax.grad(energy)(jnp.asarray(pos_np))
    np.testing.assert_allclose(res.force, f_ad, rtol=2e-4, atol=2e-4)
    # per-axis virial oracle: W_d == −dU/dε_d under a single-axis strain
    # (central FD; the diagonal stress the anisotropic barostat uses)
    from metadyn_tpu.core.box import Box as _Box
    W3 = np.asarray(res.virial)
    assert np.isfinite(W3).all() and W3.shape == (3,)
    h = 1e-3
    for d in range(3):
        def U(lam):
            sc = np.ones(3, np.float32)
            sc[d] = lam
            b2 = _Box(L=box.L * jnp.asarray(sc))
            return float(all_pairs_force(
                jnp.asarray(pos_np * sc), types, b2, kernel, params,
                row_block=16).energy)
        dU = (U(1 + h) - U(1 - h)) / (2 * h)
        np.testing.assert_allclose(W3[d], -dU, rtol=5e-2, atol=5e-3)


def test_all_pairs_row_block_invariance():
    pos_np, box = _random_fluid(50, L=5.0)
    types = jnp.zeros(50, jnp.int32)
    params = lj_tables(1)
    r1 = all_pairs_force(jnp.asarray(pos_np), types, box, lj_kernel, params, row_block=7)
    r2 = all_pairs_force(jnp.asarray(pos_np), types, box, lj_kernel, params, row_block=50)
    np.testing.assert_allclose(r1.energy, r2.energy, rtol=1e-5)
    np.testing.assert_allclose(r1.force, r2.force, rtol=1e-4, atol=1e-5)


def test_lj_dimer_known_values():
    """Two particles at the LJ minimum: F=0, E=−ε (unshifted part)."""
    box = Box.cubic(20.0)
    rmin = 2.0 ** (1 / 6)
    pos = jnp.asarray([[0.0, 0, 0], [rmin, 0, 0]], jnp.float32)
    params = lj_tables(1, r_cut=10.0, shift=False)
    res = all_pairs_force(pos, jnp.zeros(2, jnp.int32), box, lj_kernel, params)
    np.testing.assert_allclose(res.energy, -1.0, atol=1e-5)
    np.testing.assert_allclose(res.force, 0.0, atol=1e-4)


def test_harmonic_bond_matches_autodiff():
    box = Box.cubic(10.0)
    pos = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (10, 3)), jnp.float32)
    bonds = jnp.asarray([[0, 1], [1, 2], [5, 9]], jnp.int32)
    bt = jnp.zeros(3, jnp.int32)
    params = HarmonicBondParams(k=jnp.asarray([100.0]), r0=jnp.asarray([1.0]))

    def energy(p):
        return harmonic_bond_force(p, bonds, bt, box, params).energy

    res = harmonic_bond_force(pos, bonds, bt, box, params)
    np.testing.assert_allclose(res.force, -jax.grad(energy)(pos), rtol=1e-4, atol=1e-4)


def test_fene_bond_matches_autodiff():
    box = Box.cubic(10.0)
    rng = np.random.default_rng(2)
    base = rng.uniform(-2, 2, (8, 3)).astype(np.float32)
    # keep bonded pairs inside FENE range
    bonds = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    base[1] = base[0] + [0.9, 0, 0]
    base[3] = base[2] + [0, 1.1, 0]
    pos = jnp.asarray(base)
    bt = jnp.zeros(2, jnp.int32)
    params = FENEBondParams(
        k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
        epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0]),
    )

    def energy(p):
        return fene_bond_force(p, bonds, bt, box, params).energy

    res = fene_bond_force(pos, bonds, bt, box, params)
    np.testing.assert_allclose(res.force, -jax.grad(energy)(pos), rtol=1e-3, atol=1e-3)


def test_nve_energy_conservation(key):
    """Physics invariant (SURVEY.md §4.2): NVE drift small over 500 steps."""
    pos = fcc_lattice(3, 1.6)  # 108 particles, moderate density
    box = Box.cubic(3 * 1.6)
    system = make_system(pos.shape[0])
    ff = ForceField(pair_params=lj_tables(1, r_cut=2.5), pair_kernel=lj_kernel,
                    row_block=128)
    force_apply = ff.bind(system)
    state = make_state(pos, box, vel=thermal_velocities(key, system.mass, 0.5))
    state = force_apply(state)
    step = make_nve_step(force_apply, system, dt=0.002)
    e0 = float(state.potential_energy + kinetic_energy(state, system))
    state = jax.jit(lambda s: run_steps(step, s, jax.random.PRNGKey(1), 500))(state)
    e1 = float(state.potential_energy + kinetic_energy(state, system))
    assert abs(e1 - e0) / pos.shape[0] < 5e-3, (e0, e1)


@pytest.mark.smoke
def test_langevin_equipartition(key):
    """Langevin thermostat reaches the target temperature (SURVEY.md §4.2)."""
    kT = 1.2
    pos = fcc_lattice(3, 1.7)
    box = Box.cubic(3 * 1.7)
    system = make_system(pos.shape[0])
    ff = ForceField(pair_params=wca_tables(1), pair_kernel=lj_kernel, row_block=128)
    force_apply = ff.bind(system)
    state = make_state(pos, box)
    state = force_apply(state)
    step = make_langevin_step(force_apply, system, dt=0.005, kT=kT, gamma=2.0)
    state = jax.jit(lambda s: run_steps(step, s, key, 1500))(state)  # equilibrate

    # average T over sample windows
    temps = []
    for i in range(8):
        state = jax.jit(lambda s, k: run_steps(step, s, k, 50))(
            state, jax.random.PRNGKey(100 + i))
        temps.append(float(temperature(state, system)))
    t_mean = np.mean(temps)
    assert abs(t_mean - kT) / kT < 0.1, temps


def test_polymer_melt_builder():
    pos, bonds = polymer_melt(4, 10, box_L=8.0)
    assert pos.shape == (40, 3) and bonds.shape == (36, 2)
    d = np.linalg.norm(pos[bonds[:, 0]] - pos[bonds[:, 1]], axis=1)
    np.testing.assert_allclose(d, 0.97, atol=1e-5)


def test_xplor_smoothing_mode():
    """XPLOR LJ: equals plain LJ below r_on, C1-smooth to zero at r_cut,
    coef == -2 du/dr2 by finite difference across the ramp (the
    reference's pair mode="xplor", SURVEY.md §2b pair row)."""
    from metadyn_tpu.ops.pairs import xplor_tables, lj_tables, lj_kernel
    px = xplor_tables(1, r_cut=2.5, r_on=2.0)
    pl = lj_tables(1, r_cut=2.5, shift=False)
    t = jnp.zeros((), jnp.int32)
    # below r_on: identical
    for r in (1.0, 1.5, 1.99):
        ex, cx = lj_kernel(jnp.asarray(r * r), t, t, px)
        el, cl = lj_kernel(jnp.asarray(r * r), t, t, pl)
        np.testing.assert_allclose(float(ex), float(el), rtol=1e-6)
        np.testing.assert_allclose(float(cx), float(cl), rtol=1e-6)
    # at the cutoff: energy AND force go to zero (C1)
    e_rc, c_rc = lj_kernel(jnp.asarray(2.4999**2), t, t, px)
    assert abs(float(e_rc)) < 1e-4 and abs(float(c_rc)) < 1e-3
    # FD check of coef = -2 du/dr2 across the ramp
    for r2 in (4.2, 5.0, 6.0):
        h = 1e-3
        ep, _ = lj_kernel(jnp.asarray(r2 + h), t, t, px)
        em, _ = lj_kernel(jnp.asarray(r2 - h), t, t, px)
        _, c = lj_kernel(jnp.asarray(r2), t, t, px)
        np.testing.assert_allclose(float(c),
                                   -2.0 * (float(ep) - float(em)) / (2 * h),
                                   rtol=1e-2)


def test_lj_rdf_matches_literature(key):
    """Physics invariant (SURVEY.md §4.2): g(r) of the equilibrated LJ
    fluid shows the literature structure — first peak at r ≈ 1.05–1.15 σ
    with height ~1.8–3 at ρ*=0.8, T*=1.5 (Hansen–Verlet region), an
    excluded core g(r < 0.85) ≈ 0, and decay to 1 at large r.  Also the
    estimator oracle: an ideal-gas (random) configuration gives g ≡ 1."""
    from metadyn_tpu.utils.analysis import rdf

    rho, kT = 0.8, 1.5
    a = (4.0 / rho) ** (1.0 / 3.0)
    pos = fcc_lattice(4, a)                  # 256 particles
    box = Box.cubic(4 * a)
    system = make_system(pos.shape[0])
    ff = ForceField(pair_params=lj_tables(1, r_cut=2.5),
                    pair_kernel=lj_kernel, row_block=128)
    force_apply = ff.bind(system)
    state = force_apply(make_state(pos, box))
    step = make_langevin_step(force_apply, system, dt=0.004, kT=kT, gamma=1.0)
    state = jax.jit(lambda s: run_steps(step, s, key, 2000))(state)  # melt
    frames = []
    for i in range(6):
        state = jax.jit(lambda s, k: run_steps(step, s, k, 200))(
            state, jax.random.PRNGKey(40 + i))
        frames.append(np.asarray(state.pos))
    r, g = rdf(np.stack(frames), np.asarray(box.L), n_bins=80)

    ipk = int(np.argmax(g))
    assert 1.0 < r[ipk] < 1.2, (r[ipk], g[ipk])
    assert 1.7 < g[ipk] < 3.2, g[ipk]
    assert g[r < 0.85].max() < 0.05
    tail = g[r > 0.8 * r.max()]
    assert abs(tail.mean() - 1.0) < 0.15, tail.mean()

    # estimator oracle: ideal gas is structureless
    rng = np.random.default_rng(0)
    ideal = rng.uniform(0, float(box.L[0]), (4, 256, 3))
    r2, g2 = rdf(ideal, np.asarray(box.L), n_bins=40)
    assert abs(g2[r2 > 0.5].mean() - 1.0) < 0.1
