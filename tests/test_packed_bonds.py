"""Packed-engine bonded forces (FENE bead-spring) vs the particle-order
oracle — the Config 2/5 polymer-melt capability (BASELINE.json:8,11)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system, thermal_velocities
from metadyn_tpu.core.engine import AllPairsEngine
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import (
    PackedSpec, pack, packed_lj_force, bond_partner_attrs, repack_incremental,
    unpack_positions,
)
from metadyn_tpu.ops.pairs import wca_tables, lj_kernel, soft_tables, soft_kernel
from metadyn_tpu.ops.bonds import FENEBondParams
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.utils.lattice import polymer_melt


import functools


@functools.lru_cache(maxsize=None)
def _relaxed_melt(n_chains=20, chain_len=10, L=12.0, seed=0):
    """Build a melt and push off overlaps with the soft potential.
    Cached: several tests share the same fixture (CPU push-off is slow)."""
    pos, bonds = polymer_melt(n_chains, chain_len, L, seed=seed)
    n = pos.shape[0]
    system = make_system(n, bonds=bonds)
    ff = ForceField(
        pair_params=soft_tables(1, A=100.0, r_cut=1.0), pair_kernel=soft_kernel,
        row_block=n,
        fene=FENEBondParams(k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
                            epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0])))
    fa = ff.bind(system)
    state = fa(make_state(pos, Box.cubic(L)))
    step = make_langevin_step(fa, system, dt=0.002, kT=1.0, gamma=2.0)
    state = jax.jit(lambda s: run_steps(step, s, jax.random.PRNGKey(9), 800))(state)
    return np.asarray(state.unwrapped_pos()), bonds, system



@pytest.mark.smoke
def test_packed_bonded_force_matches_oracle():
    pos, bonds, system = _relaxed_melt()
    n = pos.shape[0]
    L = 12.0
    box = Box.cubic(L)
    fene = FENEBondParams(k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
                          epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0]))
    # oracle: all-pairs WCA EXCLUDING bonded pairs + FENE(+WCA) on bonds.
    # The packed engine's convention: bonded pairs get FENE+WCA instead of
    # the pair term — identical total because FENE includes its own WCA.
    from metadyn_tpu.ops.pairs import all_pairs_force
    from metadyn_tpu.ops.bonds import fene_bond_force
    types = jnp.zeros(n, jnp.int32)
    wca = wca_tables(1)
    r_all = all_pairs_force(jnp.asarray(pos), types, box, lj_kernel, wca,
                            row_block=n)
    # subtract the bonded pairs' WCA (they're excluded in the packed engine)
    i, j = bonds[:, 0], bonds[:, 1]
    from metadyn_tpu.core.box import minimum_image
    dr = minimum_image(jnp.asarray(pos)[i] - jnp.asarray(pos)[j], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    e_b, c_b = lj_kernel(r2, types[i], types[j], wca)
    f_sub = jnp.zeros((n, 3)).at[i].add(c_b[:, None] * dr).at[j].add(-c_b[:, None] * dr)
    r_fene = fene_bond_force(jnp.asarray(pos), jnp.asarray(bonds),
                             jnp.zeros(len(bonds), jnp.int32), box, fene)
    e_ref = float(r_all.energy - jnp.sum(e_b) + r_fene.energy)
    f_ref = np.asarray(r_all.force - f_sub + r_fene.force)

    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=32,
                             fene_k=30.0, fene_r0=1.5)
    st, ovf = pack(pos, box, spec, types, jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    st = packed_lj_force(st, spec)
    np.testing.assert_allclose(float(st.potential_energy), e_ref, rtol=1e-4)
    f_packed = np.asarray(st.f[:, st.slot_of].T)
    np.testing.assert_allclose(f_packed, f_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.smoke
def test_packed_pallas_bonds_interpret():
    from jax.experimental import pallas as pl
    import metadyn_tpu.ops.packed_pallas as pp
    pos, bonds, system = _relaxed_melt(n_chains=10, chain_len=8)
    n = pos.shape[0]
    L = 12.0
    box = Box.cubic(L)
    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=32,
                             fene_k=30.0, fene_r0=1.5)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n))
    a = packed_lj_force(st, spec)
    orig = pl.pallas_call
    pp.pl.pallas_call = lambda *x, **k: orig(*x, **{**k, "interpret": True})
    try:
        b = pp.packed_lj_force_pallas(st, spec)
    finally:
        pp.pl.pallas_call = orig
    np.testing.assert_allclose(float(a.potential_energy),
                               float(b.potential_energy), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.smoke
def test_packed_melt_md_stable():
    """Short packed-engine melt MD: bonds hold, no losses, finite."""
    pos, bonds, system = _relaxed_melt()
    n = pos.shape[0]
    L = 12.0
    box = Box.cubic(L)
    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=32,
                             fene_k=30.0, fene_r0=1.5)
    engine = PackedEngine(spec, use_pallas=False)
    st, ovf = engine.pack_state(pos, box, jnp.zeros(n, jnp.int32),
                                eps_i=jnp.ones(n), sigma_i=jnp.ones(n),
                                extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    st, aux = engine.init(st)
    step = make_packed_langevin_step(
        lambda s: engine.force_into(s, None), dt=0.003, kT=1.0, gamma=1.0)

    @jax.jit
    def run(st, aux, key):
        def body(c, i):
            s2, a2 = engine.rebuild(*c)
            return (step(s2, jax.random.fold_in(key, i)), a2), None
        return jax.lax.scan(body, (st, aux), jnp.arange(80))[0]

    st, aux = run(st, aux, jax.random.PRNGKey(1))
    assert int((st.pid < n).sum()) == n
    assert not bool(aux.overflow)
    assert np.isfinite(float(st.potential_energy))
    # bond lengths all inside the FENE range
    up = np.asarray(unpack_positions(st, spec))
    im = np.asarray(st.image[:, st.slot_of].T)
    up = up + im * L
    d = np.linalg.norm(up[bonds[:, 0]] - up[bonds[:, 1]], axis=1)
    assert d.max() < 1.5, d.max()


def _stretched_pair_setup():
    """Two bonded particles stretched past the WCA r_cut (but < fene_r0),
    plus an unstretched bonded pair — the regime where a cutoff-gated FENE
    silently scissions the chain."""
    L = 6.0
    box = Box.cubic(L)
    pos = np.array([
        [-0.65, 0.0, 0.0], [0.65, 0.0, 0.0],   # bond 0-1 at r=1.30 > 2^(1/6)
        [-0.485, 2.0, 0.0], [0.485, 2.0, 0.0],  # bond 2-3 at r=0.97
    ], np.float32)
    bonds = np.array([[0, 1], [2, 3]], np.int32)
    return pos, bonds, box, L


def _oracle_force(pos, bonds, box):
    """All-pairs WCA excluding bonded pairs + FENE(+WCA) on bonds."""
    from metadyn_tpu.ops.pairs import all_pairs_force
    from metadyn_tpu.ops.bonds import fene_bond_force
    from metadyn_tpu.core.box import minimum_image
    n = pos.shape[0]
    types = jnp.zeros(n, jnp.int32)
    wca = wca_tables(1)
    fene = FENEBondParams(k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
                          epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0]))
    r_all = all_pairs_force(jnp.asarray(pos), types, box, lj_kernel, wca,
                            row_block=n)
    i, j = bonds[:, 0], bonds[:, 1]
    dr = minimum_image(jnp.asarray(pos)[i] - jnp.asarray(pos)[j], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    e_b, c_b = lj_kernel(r2, types[i], types[j], wca)
    f_sub = (jnp.zeros((n, 3)).at[i].add(c_b[:, None] * dr)
             .at[j].add(-c_b[:, None] * dr))
    r_fene = fene_bond_force(jnp.asarray(pos), jnp.asarray(bonds),
                             jnp.zeros(len(bonds), jnp.int32), box, fene)
    e_ref = float(r_all.energy - jnp.sum(e_b) + r_fene.energy)
    f_ref = np.asarray(r_all.force - f_sub + r_fene.force)
    return e_ref, f_ref


def _packed_state_for(pos, bonds, box, L):
    n = pos.shape[0]
    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=8,
                             fene_k=30.0, fene_r0=1.5)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    return st, spec


@pytest.mark.smoke
def test_packed_bond_past_rcut_keeps_fene():
    """A bond stretched past the pair r_cut must keep FENE force/energy
    (the pair cutoff gates only the plain pair term)."""
    pos, bonds, box, L = _stretched_pair_setup()
    e_ref, f_ref = _oracle_force(pos, bonds, box)
    st, spec = _packed_state_for(pos, bonds, box, L)
    st = packed_lj_force(st, spec)
    np.testing.assert_allclose(float(st.potential_energy), e_ref, rtol=1e-4)
    f_packed = np.asarray(st.f[:, st.slot_of].T)
    np.testing.assert_allclose(f_packed, f_ref, rtol=1e-3, atol=1e-4)
    # the stretched bond pulls INWARD with substantial magnitude
    assert f_packed[0, 0] > 10.0 and f_packed[1, 0] < -10.0


@pytest.mark.smoke
def test_packed_pallas_bond_past_rcut_keeps_fene():
    from jax.experimental import pallas as pl
    import metadyn_tpu.ops.packed_pallas as pp
    import metadyn_tpu.ops.packed_pallas2 as pp2
    pos, bonds, box, L = _stretched_pair_setup()
    e_ref, f_ref = _oracle_force(pos, bonds, box)
    st, spec = _packed_state_for(pos, bonds, box, L)
    orig = pl.pallas_call
    patched = lambda *x, **k: orig(*x, **{**k, "interpret": True})
    pp.pl.pallas_call = patched
    pp2.pl.pallas_call = patched
    try:
        a = pp.packed_lj_force_pallas(st, spec)
        b = pp2.packed_lj_force_pallas2(st, spec)
    finally:
        pp.pl.pallas_call = orig
        pp2.pl.pallas_call = orig
    for res in (a, b):
        np.testing.assert_allclose(float(res.potential_energy), e_ref,
                                   rtol=1e-4)
        f = np.asarray(res.f[:, res.slot_of].T)
        np.testing.assert_allclose(f, f_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.smoke
def test_packed_branched_topology_star():
    """bond_slots > 2: a 4-arm star polymer (center has 4 bonds) on the
    packed engine matches the particle-order oracle — removes the
    linear-chain limitation (VERDICT r1 'smaller parity holes')."""
    L = 9.0
    box = Box.cubic(L)
    # star: center at origin, 4 arms of 2 beads each
    pos = np.array([
        [0.0, 0.0, 0.0],
        [0.95, 0.0, 0.0], [1.9, 0.0, 0.0],
        [-0.95, 0.0, 0.0], [-1.9, 0.0, 0.0],
        [0.0, 0.95, 0.0], [0.0, 1.9, 0.0],
        [0.0, -0.95, 0.0], [0.0, -1.9, 0.0],
    ], np.float32)
    bonds = np.array([[0, 1], [1, 2], [0, 3], [3, 4],
                      [0, 5], [5, 6], [0, 7], [7, 8]], np.int32)
    n = pos.shape[0]
    e_ref, f_ref = _oracle_force(pos, bonds, box)
    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=16,
                             fene_k=30.0, fene_r0=1.5, bond_slots=4)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n, slots=4))
    assert not bool(ovf)
    st_x = packed_lj_force(st, spec)
    np.testing.assert_allclose(float(st_x.potential_energy), e_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st_x.f[:, st_x.slot_of].T), f_ref,
                               rtol=1e-3, atol=1e-4)
    # both Pallas kernels (interpret)
    from jax.experimental import pallas as pl
    import metadyn_tpu.ops.packed_pallas as pp
    import metadyn_tpu.ops.packed_pallas2 as pp2
    orig = pl.pallas_call
    patched = lambda *x, **k: orig(*x, **{**k, "interpret": True})
    pp.pl.pallas_call = patched
    pp2.pl.pallas_call = patched
    try:
        a = pp.packed_lj_force_pallas(st, spec)
        b = pp2.packed_lj_force_pallas2(st, spec)
    finally:
        pp.pl.pallas_call = orig
        pp2.pl.pallas_call = orig
    for res in (a, b):
        np.testing.assert_allclose(float(res.potential_energy), e_ref,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.f[:, res.slot_of].T),
                                   f_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.smoke
def test_kremer_grest_melt_rg_sanity():
    """Physics invariant (SURVEY.md §4.2): Kremer–Grest bead-spring melt
    chains have near-ideal dimensions — for N=16, ρ=0.85, kT=1 the
    literature chain statistics (l≈0.97, C∞≈1.7 with a finite-N
    correction) give ⟨Rg²⟩ ≈ 3.3–4.2.  Assert a generous band around it:
    a broken FENE/WCA balance (collapsed or swollen chains) lands far
    outside."""
    n_chains, chain_len = 40, 16
    n = n_chains * chain_len
    rho = 0.85
    L = float((n / rho) ** (1 / 3))
    # persistence 0.26 ⇒ ⟨cosθ⟩ matching C∞≈1.7: chains START at the
    # target melt statistics (standard melt-preparation practice — the
    # N=16 Rouse time ≫ this test's budget, so the test checks the
    # dynamics PRESERVE near-ideal dimensions rather than re-derive them)
    pos, bonds = polymer_melt(n_chains, chain_len, L, seed=4,
                              grid_starts=True, persistence=0.26)
    system = make_system(n, bonds=bonds)
    fene = FENEBondParams(k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
                          epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0]))
    # staged soft push-off (melt-preparation ramp): at ρ=0.85 a single
    # A=100 stage leaves r_min≈0.3 and the WCA switch-on detonates
    state = make_state(pos, Box.cubic(L))
    for A, steps, dt in [(20.0, 300, 0.001), (60.0, 300, 0.002),
                         (150.0, 400, 0.002), (400.0, 300, 0.002)]:
        ff_soft = ForceField(pair_params=soft_tables(1, A=A, r_cut=1.0),
                             pair_kernel=soft_kernel, row_block=n, fene=fene)
        fa_soft = ff_soft.bind(system)
        state = fa_soft(state)
        step = make_langevin_step(fa_soft, system, dt=dt, kT=1.0, gamma=2.0)
        state = jax.jit(lambda s, _step=step, _n=steps: run_steps(
            _step, s, jax.random.PRNGKey(int(A)), _n))(state)
    # production: WCA + FENE (the Kremer–Grest model); short small-dt settle
    ff = ForceField(pair_params=wca_tables(1), pair_kernel=lj_kernel,
                    row_block=n, fene=fene)
    fa = ff.bind(system)
    state = fa(state)
    settle = make_langevin_step(fa, system, dt=0.002, kT=1.0, gamma=2.0)
    state = jax.jit(lambda s: run_steps(settle, s, jax.random.PRNGKey(2), 300))(state)
    kg_step = make_langevin_step(fa, system, dt=0.005, kT=1.0, gamma=1.0)

    @jax.jit
    def chunk(s, key):
        return run_steps(kg_step, s, key, 400)

    rg2_samples = []
    key = jax.random.PRNGKey(11)
    for b in range(8):
        state = chunk(state, jax.random.fold_in(key, b))
        if b >= 3:                       # discard equilibration blocks
            r = np.asarray(state.unwrapped_pos()).reshape(
                n_chains, chain_len, 3)
            com = r.mean(axis=1, keepdims=True)
            rg2_samples.append(((r - com) ** 2).sum(-1).mean())
    rg2 = float(np.mean(rg2_samples))
    # bonds stayed whole (FENE never broke): max bond length < r0
    r_u = np.asarray(state.unwrapped_pos())
    bl = np.linalg.norm(r_u[bonds[:, 0]] - r_u[bonds[:, 1]], axis=1)
    assert bl.max() < 1.4, f"stretched/broken FENE bond: {bl.max():.3f}"
    assert 0.9 < bl.mean() < 1.05, f"bond length off: {bl.mean():.3f}"
    assert 2.3 < rg2 < 5.5, f"melt chain Rg² {rg2:.2f} outside KG band"


# ---------------------------------------------------------------------------
# harmonic bonds on the packed engine (HOOMD PotentialBondHarmonic parity)

def _harmonic_oracle(pos, bonds, L, k=80.0, r0=1.0):
    """Particle-order reference with the packed engine's exclusion
    convention: WCA over NON-bonded pairs + harmonic springs on bonds."""
    from metadyn_tpu.ops.pairs import all_pairs_force
    from metadyn_tpu.ops.bonds import HarmonicBondParams, harmonic_bond_force
    from metadyn_tpu.core.box import minimum_image

    n = pos.shape[0]
    box = Box.cubic(L)
    types = jnp.zeros(n, jnp.int32)
    wca = wca_tables(1)
    r_all = all_pairs_force(jnp.asarray(pos), types, box, lj_kernel, wca,
                            row_block=n)
    i, j = bonds[:, 0], bonds[:, 1]
    dr = minimum_image(jnp.asarray(pos)[i] - jnp.asarray(pos)[j], box)
    r2 = jnp.sum(dr * dr, axis=-1)
    e_b, c_b = lj_kernel(r2, types[i], types[j], wca)
    f_sub = (jnp.zeros((n, 3)).at[i].add(c_b[:, None] * dr)
             .at[j].add(-c_b[:, None] * dr))
    hb = harmonic_bond_force(
        jnp.asarray(pos), jnp.asarray(bonds),
        jnp.zeros(len(bonds), jnp.int32), box,
        HarmonicBondParams(k=jnp.asarray([k]), r0=jnp.asarray([r0])))
    e_ref = float(r_all.energy - jnp.sum(e_b) + hb.energy)
    f_ref = np.asarray(r_all.force - f_sub + hb.force)
    return e_ref, f_ref


@pytest.mark.smoke
def test_packed_harmonic_bonds_match_oracle():
    """bond_kind='harmonic': the packed in-kernel bond branch reproduces
    ops/bonds.harmonic_bond_force + exclusion-adjusted WCA to f32
    (VERDICT r3 item 6 — the production path can now run harmonic
    bead-spring models)."""
    pos, bonds, system = _relaxed_melt()
    n = pos.shape[0]
    L = 12.0
    e_ref, f_ref = _harmonic_oracle(pos, bonds, L)

    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=32,
                             fene_k=80.0, fene_r0=1.0,
                             bond_kind="harmonic")
    st, ovf = pack(pos, Box.cubic(L), spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    st = packed_lj_force(st, spec)
    np.testing.assert_allclose(float(st.potential_energy), e_ref, rtol=1e-4)
    f_packed = np.asarray(st.f[:, st.slot_of].T)
    np.testing.assert_allclose(f_packed, f_ref, rtol=1e-3, atol=1e-3)


def test_packed_harmonic_bonds_pallas2_interpret():
    """The Newton-halved Pallas kernel dispatches the same bond_kind."""
    from jax.experimental import pallas as pl
    import metadyn_tpu.ops.packed_pallas2 as pp2

    pos, bonds, system = _relaxed_melt(n_chains=10, chain_len=8)
    n = pos.shape[0]
    L = 12.0
    spec = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.4, cap=32,
                             fene_k=80.0, fene_r0=1.0,
                             bond_kind="harmonic")
    st, ovf = pack(pos, Box.cubic(L), spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n),
                   extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    a = packed_lj_force(st, spec)
    orig = pl.pallas_call
    pp2.pl.pallas_call = lambda *ar, **k: orig(*ar, **{**k,
                                                       "interpret": True})
    try:
        b = pp2.packed_lj_force_pallas2(st, spec)
    finally:
        pp2.pl.pallas_call = orig
    np.testing.assert_allclose(float(a.potential_energy),
                               float(b.potential_energy), rtol=1e-4)
    scale = float(jnp.abs(a.f).max())
    np.testing.assert_allclose(np.asarray(b.f), np.asarray(a.f),
                               rtol=1e-3, atol=1e-3 * scale)


@pytest.mark.smoke
@pytest.mark.slow
@pytest.mark.parametrize("dd", ["1d", "2d"])
def test_packed_harmonic_bonds_under_spatial_dd(dd):
    """Harmonic chains step identically on the sharded engines: ghost
    planes carry the partner attrs, so cross-boundary springs act
    (VERDICT r3 item 6 'runs under spatial DD').  The 2-D case covers
    cross-CORNER springs too — the two-hop halo exchange carries the
    corner partner attrs (round-4 VERDICT weak #4: 2-D DD bond parity
    was untested)."""
    from jax.sharding import Mesh
    from metadyn_tpu.parallel.spatial import SpatialPackedEngine
    from metadyn_tpu.parallel.spatial2d import SpatialPackedEngine2D

    pos, bonds, system = _relaxed_melt(n_chains=16, chain_len=8, L=12.0)
    n = pos.shape[0]
    L = 12.0
    box = Box.cubic(L)
    rng = np.random.default_rng(2)
    vel = rng.normal(0, 1.0, (n, 3)).astype(np.float32)

    def run(engine, spec):
        st, ovf = engine.pack_state(
            pos, box, np.zeros(n, np.int32), eps_i=np.ones(n, np.float32),
            sigma_i=np.ones(n, np.float32), vel=vel,
            extra_attrs=bond_partner_attrs(bonds, n))
        assert not bool(ovf)
        st, aux = engine.init(st)
        step = make_packed_langevin_step(
            lambda s: engine.force_into(s, aux), dt=0.002, kT=1.0,
            gamma=1.0)

        @jax.jit
        def blocks(c):
            def blk(c2, b):
                s2, a2 = engine.rebuild(*c2)

                def body(s3, i):
                    return step(s3, jax.random.fold_in(
                        jax.random.PRNGKey(5), b * 5 + i)), None

                s2, _ = jax.lax.scan(body, s2, jnp.arange(5))
                return (s2, a2), None
            return jax.lax.scan(blk, c, jnp.arange(8))[0]

        st, aux = blocks((st, aux))
        return np.asarray(unpack_positions(st, spec))

    # skin 0.85 -> 6 x-cells: divisible over the 2-device mesh
    spec1 = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.85, cap=48,
                              fene_k=80.0, fene_r0=1.0,
                              bond_kind="harmonic")
    p_ref = run(PackedEngine(spec1, rebuild_every=5, use_pallas=False),
                spec1)
    spec2 = PackedSpec.create(L, n, r_cut=2.0 ** (1 / 6), skin=0.85, cap=48,
                              fene_k=80.0, fene_r0=1.0,
                              bond_kind="harmonic")
    if dd == "1d":
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("space",))
        eng = SpatialPackedEngine(spec2, mesh, rebuild_every=5)
    else:
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    ("spacex", "spacey"))
        eng = SpatialPackedEngine2D(spec2, mesh, rebuild_every=5)
    p_dd = run(eng, spec2)
    np.testing.assert_allclose(p_dd, p_ref, rtol=1e-4, atol=1e-4)
