"""Triclinic-box tests: HOOMD BoxDim tilt-factor parity (SURVEY.md §2b
BoxDim/PBC row — "triclinic-capable").

The load-bearing oracle is lattice reparametrization: the SAME infinite
periodic system is described by an orthorhombic cell h1 = diag(L) and by
the tilted cell h2 = h1 @ M for any unimodular integer M — total pair
energy, forces on matched particles, and any CV evaluated at matched wave
vectors must be identical between the two descriptions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import (
    Box, fractional, from_fractional, h_matrix, h_inverse,
    min_perpendicular_width, minimum_image, unwrap, wrap,
)
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.langevin import make_langevin_step, make_nve_step
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.ops.pairs import all_pairs_force, lj_kernel, lj_tables
from metadyn_tpu.utils.lattice import sc_lattice


def _tilted(L=8.0, xy=0.3, xz=-0.2, yz=0.15):
    return Box.triclinic(L, L, L, xy, xz, yz)


def test_h_matrix_inverse_and_volume():
    box = _tilted()
    h = np.asarray(h_matrix(box))
    hinv = np.asarray(h_inverse(box))
    np.testing.assert_allclose(h @ hinv, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(float(box.volume), np.linalg.det(h),
                               rtol=1e-6)
    # HOOMD parametrization: h[0,1] = xy*Ly etc.
    np.testing.assert_allclose(h[0, 1], 0.3 * 8.0, rtol=1e-6)
    np.testing.assert_allclose(h[0, 2], -0.2 * 8.0, rtol=1e-6)
    np.testing.assert_allclose(h[1, 2], 0.15 * 8.0, rtol=1e-6)


def test_wrap_unwrap_roundtrip_triclinic():
    box = _tilted()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-30, 30, (64, 3)), jnp.float32)
    wrapped, shift = wrap(pos, box)
    f = np.asarray(fractional(wrapped, box))
    assert (f >= -0.5 - 1e-5).all() and (f < 0.5 + 1e-5).all()
    np.testing.assert_allclose(unwrap(wrapped, shift, box), pos,
                               atol=2e-4)
    # image counters count lattice vectors: re-wrapping is a fixed point
    w2, s2 = wrap(wrapped, box)
    assert np.abs(np.asarray(s2)).max() == 0


def test_minimum_image_matches_brute_force():
    """Fractional-rounding minimum image == true nearest image for
    separations below half the min perpendicular width (the validity
    domain the engines enforce)."""
    box = _tilted(L=7.0, xy=0.4, xz=0.2, yz=-0.3)
    h = np.asarray(h_matrix(box), np.float64)
    wmin = float(np.min(np.asarray(min_perpendicular_width(box))))
    rng = np.random.default_rng(1)
    dr = rng.uniform(-12, 12, (512, 3))
    mi = np.asarray(minimum_image(jnp.asarray(dr, jnp.float32), box),
                    np.float64)
    # brute force over 5^3 lattice images
    ns = np.array(np.meshgrid(*([range(-2, 3)] * 3),
                              indexing="ij")).reshape(3, -1).T
    shifts = ns @ h.T                                     # (125, 3)
    alld = dr[:, None, :] - shifts[None, :, :]
    dmin = np.min(np.linalg.norm(alld, axis=-1), axis=1)
    sel = dmin < 0.49 * wmin
    assert sel.sum() > 30, "test setup: want a populated validity domain"
    np.testing.assert_allclose(np.linalg.norm(mi[sel], axis=-1), dmin[sel],
                               rtol=1e-5, atol=1e-5)
    # and the result is always SOME lattice image (exactness aside)
    f = np.linalg.solve(h, (dr - mi).T).T
    np.testing.assert_allclose(f, np.round(f), atol=1e-4)


def _reparametrized_pair(L=9.0, n=5, seed=2):
    """(pos, box1, pos2, box2): one fluid described in the ortho cell and
    in the tilted cell h2 = h1 @ M, M = [[1,1,0],[0,1,0],[0,0,1]] (xy =
    Lx/Ly).  Same Cartesian particles, different wrapping."""
    rng = np.random.default_rng(seed)
    pos = (sc_lattice(n, L / n)[: n ** 3]
           + rng.uniform(-0.12, 0.12, (n ** 3, 3))).astype(np.float32)
    box1 = Box.cubic(L)
    box2 = Box.triclinic(L, L, L, xy=1.0)
    pos2, _ = wrap(jnp.asarray(pos), box2)
    return jnp.asarray(pos), box1, pos2, box2


def test_lj_energy_invariant_under_reparametrization():
    """Total LJ energy and per-particle forces agree between the ortho
    and the unimodularly tilted description of the same system (r_cut
    below half the tilted cell's min perpendicular width)."""
    pos1, box1, pos2, box2 = _reparametrized_pair()
    assert 2.5 < 0.5 * float(np.min(np.asarray(
        min_perpendicular_width(box2))))
    types = jnp.zeros(pos1.shape[0], jnp.int32)
    params = lj_tables(1, r_cut=2.5)
    r1 = all_pairs_force(pos1, types, box1, lj_kernel, params, row_block=25)
    r2 = all_pairs_force(pos2, types, box2, lj_kernel, params, row_block=25)
    np.testing.assert_allclose(float(r1.energy), float(r2.energy),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(r1.force), np.asarray(r2.force),
                               atol=2e-3)
    # scalar virial is frame-independent too
    np.testing.assert_allclose(float(jnp.sum(r1.virial)),
                               float(jnp.sum(r2.virial)), rtol=2e-4)


def test_lamellar_cv_invariant_under_reparametrization():
    """k(n₂, h₂) == k(n₁, h₁) for n₂ = n₁ @ M ⇒ identical CV value:
    the reciprocal-lattice construction (cv/lamellar.py) is exact."""
    from metadyn_tpu.cv.lamellar import LamellarOP

    pos1, box1, pos2, box2 = _reparametrized_pair(seed=3)
    system = make_system(pos1.shape[0])
    M = np.array([[1, 1, 0], [0, 1, 0], [0, 0, 1]])
    n1 = np.array([[1, 0, 0], [0, 1, 0], [2, 1, 0]])
    n2 = n1 @ M
    cv1 = LamellarOP.create(mode=[1.0], lattice_vectors=n1)
    cv2 = LamellarOP.create(mode=[1.0], lattice_vectors=n2)
    s1 = float(cv1.value(make_state(pos1, box1), system))
    s2 = float(cv2.value(make_state(pos2, box2), system))
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    # sanity: the wave vectors really differ between descriptions
    assert not np.array_equal(n1, n2)


def test_mesh_cv_triclinic():
    """Mesh CV under tilt: zero-tilt equals the orthorhombic path
    bitwise-level, and translation by one mesh lattice vector (a
    NON-Cartesian direction under tilt) is an exact symmetry."""
    from metadyn_tpu.cv.mesh import MeshOrderParameter

    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(-3, 3, (32, 3)), jnp.float32)
    system = make_system(32)
    cv = MeshOrderParameter.create((8, 8, 8), None, mode=[1.0], k0=2.0,
                                   width=0.7)
    s_ortho = float(cv.value(make_state(pos, Box.cubic(8.0)), system))
    s_zero_tilt = float(cv.value(
        make_state(pos, Box.triclinic(8.0, 8.0, 8.0)), system))
    np.testing.assert_allclose(s_ortho, s_zero_tilt, rtol=1e-6)

    box = _tilted(L=8.0)
    st = make_state(pos, box)
    s = float(cv.value(st, system))
    assert np.isfinite(s) and s > 0
    # shift by exactly one mesh cell along the tilted b-axis: h @ (0,1/8,0)
    shift = from_fractional(jnp.asarray([0.0, 1.0 / 8.0, 0.0]), box)
    st2 = make_state(pos + shift[None, :], box)
    np.testing.assert_allclose(float(cv.value(st2, system)), s, rtol=1e-4)
    # the bias force exists via the shared vjp and is finite
    g = jax.grad(lambda p: cv.value(make_state(p, box), system))(pos)
    assert np.isfinite(np.asarray(g)).all()


def test_md_in_tilted_box():
    """Short NVE + Langevin runs in a tilted cell: energy drift bounded,
    equipartition temperature right — wrap/min-image dynamics are
    consistent (forces match the wrapped geometry every step)."""
    from metadyn_tpu.core.state import kinetic_energy, temperature

    rng = np.random.default_rng(5)
    n = 125
    L = 7.0
    pos = (sc_lattice(5, L / 5)[:n]
           + rng.uniform(-0.08, 0.08, (n, 3))).astype(np.float32)
    box = Box.triclinic(L, L, L, xy=0.25, xz=-0.15, yz=0.1)
    assert 2.5 < 0.5 * float(np.min(np.asarray(
        min_perpendicular_width(box))))
    system = make_system(n)
    ff = ForceField(pair_params=lj_tables(1, r_cut=2.5),
                    pair_kernel=lj_kernel, row_block=25)
    fa = ff.bind(system)
    kT = 0.8
    vel = rng.normal(0, np.sqrt(kT), (n, 3)).astype(np.float32)
    vel -= vel.mean(axis=0)
    st = fa(make_state(jnp.asarray(pos), box, vel=jnp.asarray(vel)))

    # thermalize, then NVE: relative drift of E_tot small
    lstep = make_langevin_step(fa, system, dt=0.003, kT=kT, gamma=1.0)
    st = jax.jit(lambda s: run_steps(lstep, s, jax.random.PRNGKey(0), 300))(st)
    nve = make_nve_step(fa, system, dt=0.003)
    e0 = float(st.potential_energy + kinetic_energy(st, system))
    st2 = jax.jit(lambda s: run_steps(nve, s, jax.random.PRNGKey(1), 400))(st)
    e1 = float(st2.potential_energy + kinetic_energy(st2, system))
    assert abs(e1 - e0) / (abs(e0) + 1e-9) < 5e-3, (e0, e1)
    T = float(temperature(st2, system))
    assert 0.4 < T < 1.4, T
    # positions stayed wrapped in the tilted cell
    f = np.asarray(fractional(st2.pos, box))
    assert (f >= -0.51).all() and (f <= 0.51).all()


def test_remaining_triclinic_guards():
    """Paths that stay orthorhombic-only refuse tilted boxes with a clear
    message instead of silently mis-binning: the particle-order cell
    list; the packed engine itself now SUPPORTS tilt
    (tests/test_packed_triclinic.py)."""
    from metadyn_tpu.ops.cell_list import CellSpec, build_neighbor_list

    box = _tilted(L=12.0)
    pos = jnp.asarray(
        np.random.default_rng(6).uniform(-6, 6, (16, 3)), jnp.float32)
    spec = CellSpec.create(12.0, 16, r_cut=2.5, skin=0.4)
    with pytest.raises(AssertionError, match="orthorhombic"):
        build_neighbor_list(pos, box, spec)
