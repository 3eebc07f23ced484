"""P5 collective-variable tests against physics oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.cv.lamellar import LamellarOP
from metadyn_tpu.cv.mesh import MeshOrderParameter, cic_assign
from metadyn_tpu.cv.steinhardt import SteinhardtQl
from metadyn_tpu.cv.msd import MSD
from metadyn_tpu.cv.simple import EnergyCV
from metadyn_tpu.utils.lattice import fcc_lattice, sc_lattice


def test_lamellar_perfect_wave():
    """Particles arranged in cos-weighted density → s ≈ expected amplitude."""
    n, L = 4000, 20.0
    rng = np.random.default_rng(0)
    # rejection-sample density ∝ 1 + 0.8 cos(k z), k = 2π·2/L
    z = rng.uniform(-L / 2, L / 2, 4 * n)
    keep = rng.uniform(0, 1.8, 4 * n) < 1 + 0.8 * np.cos(2 * np.pi * 2 * z / L)
    z = z[keep][:n]
    pos = np.stack([rng.uniform(-L / 2, L / 2, n), rng.uniform(-L / 2, L / 2, n), z], 1)
    state = make_state(pos.astype(np.float32), Box.cubic(L))
    system = make_system(n)
    cv = LamellarOP.create(mode=[1.0], lattice_vectors=[[0, 0, 2]])
    s = float(cv.value(state, system))
    assert abs(s - 0.4) < 0.03, s  # ⟨cos⟩ = amplitude/2


def test_cic_assign_conserves_mass():
    n, L = 100, 10.0
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    rho = cic_assign(pos, w, Box.cubic(L), (8, 8, 8))
    np.testing.assert_allclose(float(rho.sum()), float(w.sum()), rtol=1e-5)


def test_mesh_cv_detects_density_wave():
    """S(k) CV large for a density wave at k0, small for uniform fluid."""
    n, L = 4096, 16.0
    rng = np.random.default_rng(2)
    k0 = 2 * np.pi * 2 / L  # wave with 2 periods across the box
    z = rng.uniform(-L / 2, L / 2, 6 * n)
    keep = rng.uniform(0, 2.0, 6 * n) < 1 + 0.9 * np.cos(k0 * z)
    z = z[keep][:n]
    pos_wave = np.stack(
        [rng.uniform(-L / 2, L / 2, n), rng.uniform(-L / 2, L / 2, n), z], 1)
    pos_unif = rng.uniform(-L / 2, L / 2, (n, 3))
    system = make_system(n)
    cv = MeshOrderParameter.create((16, 16, 16), L, mode=[1.0], k0=k0, width=0.2)
    s_wave = float(cv.value(make_state(pos_wave.astype(np.float32), Box.cubic(L)), system))
    s_unif = float(cv.value(make_state(pos_unif.astype(np.float32), Box.cubic(L)), system))
    assert s_wave > 20 * s_unif, (s_wave, s_unif)
    # both ±k0 peaks land in the window: s/N ≈ A²/2 × W_CIC(k0)²
    # (A=0.9 → 0.405, CIC attenuation ~0.9 → ≈0.36)
    assert 0.25 < s_wave / n < 0.45, s_wave / n


def test_tsc_assign_conserves_mass_and_spreads():
    """TSC (order 3): mass conserved; each particle touches 27 nodes with
    quadratic-B-spline weights (support one full cell wider than CIC)."""
    from metadyn_tpu.cv.mesh import mesh_assign
    n, L = 100, 10.0
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(-L / 2, L / 2, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    rho = mesh_assign(pos, w, Box.cubic(L), (8, 8, 8), order=3)
    np.testing.assert_allclose(float(rho.sum()), float(w.sum()), rtol=1e-5)
    # one particle exactly at a node center: TSC still spreads (0.75^3 on
    # the node), CIC concentrates everything on it
    one = jnp.asarray([[0.625, 0.625, 0.625]], jnp.float32)  # node 5 of 8
    r3 = mesh_assign(one, jnp.ones(1), Box.cubic(L), (8, 8, 8), order=3)
    r2 = mesh_assign(one, jnp.ones(1), Box.cubic(L), (8, 8, 8), order=2)
    np.testing.assert_allclose(float(r3.max()), 0.75 ** 3, rtol=1e-5)
    np.testing.assert_allclose(float(r2.max()), 1.0, rtol=1e-5)


def test_mesh_cv_tsc_density_wave():
    """TSC mesh CV sees the same density wave as CIC, with the slightly
    stronger window attenuation (W = sinc^3 vs sinc^2 per axis)."""
    n, L = 4096, 16.0
    rng = np.random.default_rng(2)
    k0 = 2 * np.pi * 2 / L
    z = rng.uniform(-L / 2, L / 2, 6 * n)
    keep = rng.uniform(0, 2.0, 6 * n) < 1 + 0.9 * np.cos(k0 * z)
    z = z[keep][:n]
    pos = np.stack(
        [rng.uniform(-L / 2, L / 2, n), rng.uniform(-L / 2, L / 2, n), z], 1)
    system = make_system(n)
    state = make_state(pos.astype(np.float32), Box.cubic(L))
    s = {}
    for order in (2, 3):
        cv = MeshOrderParameter.create((16, 16, 16), L, mode=[1.0], k0=k0,
                                       width=0.2, assign_order=order)
        s[order] = float(cv.value(state, system))
    # x = k0*h/2 = pi/8: attenuation ratio sinc(x)^2 = 0.983
    assert 0.25 < s[3] / n < 0.45, s
    np.testing.assert_allclose(s[3] / s[2], 0.9745 ** 2, rtol=5e-3)


@pytest.mark.parametrize("order", [2, 3], ids=["cic", "tsc"])
def test_mesh_cv_differentiable_orders(order):
    """FD oracle for the mesh-CV gradient at both assignment orders (the
    TSC weights are C^1, so the vjp force is continuous across cells)."""
    n, L = 64, 8.0
    rng = np.random.default_rng(3)
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    system = make_system(n)
    state = make_state(pos, Box.cubic(L))
    cv = MeshOrderParameter.create((8, 8, 8), L, mode=[1.0], k0=1.5,
                                   assign_order=order)
    g = jax.grad(lambda p: cv.value(state.replace(pos=p), system))(state.pos)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-3
    p1 = state.pos.at[5, 2].add(eps)
    p2 = state.pos.at[5, 2].add(-eps)
    fd = (float(cv.value(state.replace(pos=p1), system))
          - float(cv.value(state.replace(pos=p2), system))) / (2 * eps)
    np.testing.assert_allclose(float(g[5, 2]), fd, rtol=2e-2, atol=1e-4)


def test_mesh_cv_differentiable():
    n, L = 64, 8.0
    rng = np.random.default_rng(3)
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    system = make_system(n)
    state = make_state(pos, Box.cubic(L))
    cv = MeshOrderParameter.create((8, 8, 8), L, mode=[1.0], k0=1.5)

    g = jax.grad(lambda p: cv.value(state.replace(pos=p), system))(state.pos)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one coordinate
    eps = 1e-3
    p1 = state.pos.at[5, 2].add(eps)
    p2 = state.pos.at[5, 2].add(-eps)
    fd = (float(cv.value(state.replace(pos=p1), system))
          - float(cv.value(state.replace(pos=p2), system))) / (2 * eps)
    np.testing.assert_allclose(float(g[5, 2]), fd, rtol=2e-2, atol=1e-4)


def test_steinhardt_q6_fcc():
    """Perfect fcc with 12 nearest neighbors: Q6 = 0.57452 (textbook)."""
    a = 1.6
    pos = fcc_lattice(4, a)
    L = 4 * a
    state = make_state(pos, Box.cubic(L))
    system = make_system(pos.shape[0])
    nn = a / np.sqrt(2)  # fcc nearest-neighbor distance
    cv = SteinhardtQl(r_cut=nn * 1.2, l=6, row_block=128)
    q6 = float(cv.value(state, system))
    np.testing.assert_allclose(q6, 0.57452, atol=2e-3)


def test_steinhardt_q4_fcc():
    """fcc Q4 = 0.19094."""
    a = 1.6
    pos = fcc_lattice(4, a)
    state = make_state(pos, Box.cubic(4 * a))
    system = make_system(pos.shape[0])
    cv = SteinhardtQl(r_cut=a / np.sqrt(2) * 1.2, l=4, row_block=128)
    np.testing.assert_allclose(float(cv.value(state, system)), 0.19094, atol=2e-3)


def test_steinhardt_q6_disordered_small():
    rng = np.random.default_rng(4)
    n, L = 500, 10.0
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    state = make_state(pos, Box.cubic(L))
    system = make_system(n)
    q6 = float(SteinhardtQl(r_cut=1.6, l=6, row_block=125).value(state, system))
    assert q6 < 0.25, q6  # random gas ≪ crystal value


def test_steinhardt_differentiable():
    a = 1.6
    pos = fcc_lattice(2, a)
    state = make_state(pos, Box.cubic(2 * a))
    system = make_system(pos.shape[0])
    cv = SteinhardtQl(r_cut=a / np.sqrt(2) * 1.2, l=6, row_block=32)
    g = jax.grad(lambda p: cv.value(state.replace(pos=p), system))(state.pos)
    assert np.all(np.isfinite(np.asarray(g)))
    # perfect crystal is a symmetric extremum → net gradient ~ 0 per particle
    eps = 1e-3
    p1 = state.pos.at[3, 0].add(eps)
    fd = (float(cv.value(state.replace(pos=p1), system))
          - float(cv.value(state, system))) / eps
    np.testing.assert_allclose(float(g[3, 0]), fd, rtol=5e-2, atol=1e-3)


def test_msd_cv():
    n, L = 32, 10.0
    rng = np.random.default_rng(5)
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    state = make_state(pos, Box.cubic(L))
    system = make_system(n)
    cv = MSD.create(pos)
    assert float(cv.value(state, system)) == pytest.approx(0.0)
    moved = state.replace(pos=state.pos + jnp.asarray([0.3, 0, 0]))
    np.testing.assert_allclose(float(cv.value(moved, system)), 0.09, rtol=1e-4)
    # wrap-through-boundary must use unwrapped coordinates
    from metadyn_tpu.core.box import wrap
    p2, shift = wrap(state.pos + jnp.asarray([L, 0, 0]), state.box)
    moved2 = state.replace(pos=p2, image=state.image + shift)
    np.testing.assert_allclose(float(cv.value(moved2, system)), L * L, rtol=1e-4)


def test_energy_cv_wrapper():
    """CollectiveWrapper parity: any energy function as a CV."""
    n, L = 16, 8.0
    rng = np.random.default_rng(6)
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    state = make_state(pos, Box.cubic(L))
    system = make_system(n)
    cv = EnergyCV(energy_fn=lambda p, st, sys: jnp.sum(p[:, 0] ** 2), name="wte")
    np.testing.assert_allclose(float(cv.value(state, system)),
                               float(jnp.sum(state.pos[:, 0] ** 2)), rtol=1e-6)


def test_mesh_bias_virial_fd_oracle():
    """bias_virial == −dE_bias/dλ under uniform scaling (r→λr, L→λL),
    checked by central finite difference (SURVEY.md §3.3 k-space virial)."""
    from metadyn_tpu.cv.mesh import MeshOrderParameter
    from metadyn_tpu.core.state import make_state, make_system
    from metadyn_tpu.core.box import Box
    rng = np.random.default_rng(0)
    n, L = 256, 10.0
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float64)
    system = make_system(n)
    cv = MeshOrderParameter.create((16, 16, 16), L, mode=[1.0],
                                   k0=2.0 * np.pi * 3 / L, width=0.4)
    dVds = 1.37

    def E(lam):
        st = make_state((pos * lam).astype(np.float32), Box.cubic(L * lam))
        # E_bias = dVds·s is the local linearization of V(s) — its
        # λ-derivative at λ=1 is what the virial encodes
        return dVds * float(cv.value(st, system))

    h = 1e-3
    dE = (E(1 + h) - E(1 - h)) / (2 * h)
    st = make_state(pos.astype(np.float32), Box.cubic(L))
    W3 = np.asarray(cv.bias_virial(st, system, jnp.float32(dVds)))
    W = float(W3.sum())   # trace = uniform-scaling virial
    np.testing.assert_allclose(W, -dE, rtol=2e-2)
    assert abs(W) > 1e-3  # nontrivial

    # per-axis oracle: strain ONE axis, W_d == −dE/dε_d (VERDICT r2 #6)
    def E_axis(lam, d):
        sc = np.ones(3)
        sc[d] = lam
        st2 = make_state((pos * sc).astype(np.float32),
                         Box(L=jnp.asarray([L, L, L]) * jnp.asarray(sc)))
        return dVds * float(cv.value(st2, system))

    for d in range(3):
        dEd = (E_axis(1 + h, d) - E_axis(1 - h, d)) / (2 * h)
        np.testing.assert_allclose(W3[d], -dEd, rtol=3e-2, atol=1e-4)


def test_msd_bias_virial_fd_oracle():
    from metadyn_tpu.cv.msd import MSD
    from metadyn_tpu.core.state import make_state, make_system
    from metadyn_tpu.core.box import Box
    rng = np.random.default_rng(1)
    n, L = 64, 8.0
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float64)
    ref = pos + rng.normal(0, 0.3, pos.shape)
    system = make_system(n)
    cv = MSD.create(ref.astype(np.float32))
    dVds = -0.8

    def E(lam):
        st = make_state((pos * lam).astype(np.float32), Box.cubic(L * lam))
        return dVds * float(cv.value(st, system))

    h = 1e-3
    dE = (E(1 + h) - E(1 - h)) / (2 * h)
    st = make_state(pos.astype(np.float32), Box.cubic(L))
    W = float(np.asarray(cv.bias_virial(st, system, jnp.float32(dVds))).sum())
    np.testing.assert_allclose(W, -dE, rtol=2e-2)


def test_lamellar_scale_invariance():
    """The lamellar CV is exactly scale-invariant (k·r is a fractional
    coordinate), so its bias virial is identically zero — documented
    behavior backing the no-method default in make_biased_force."""
    from metadyn_tpu.cv.lamellar import LamellarOP
    from metadyn_tpu.core.state import make_state, make_system
    from metadyn_tpu.core.box import Box
    rng = np.random.default_rng(2)
    n, L = 128, 9.0
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float64)
    system = make_system(n)
    cv = LamellarOP.create(mode=[1.0], lattice_vectors=[[0, 0, 2]])
    v1 = float(cv.value(make_state(pos.astype(np.float32),
                                   Box.cubic(L)), system))
    v2 = float(cv.value(make_state((pos * 1.1).astype(np.float32),
                                   Box.cubic(L * 1.1)), system))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
