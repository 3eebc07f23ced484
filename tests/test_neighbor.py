"""Cell/neighbor-list differential tests (SURVEY.md §4.3): the fixed-shape
list must reproduce O(N²) all-pairs forces on random and adversarial
configurations, and the rebuild machinery must keep MD trajectories correct."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system, thermal_velocities
from metadyn_tpu.core.engine import AllPairsEngine, NeighborEngine, run_md_blocks
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.ops.cell_list import (
    CellSpec, build_neighbor_list, needs_rebuild, exclusions_from_bonds,
)
from metadyn_tpu.ops.neighbor_force import neighbor_pair_force
from metadyn_tpu.ops.pairs import lj_tables, lj_kernel, all_pairs_force
from metadyn_tpu.utils.lattice import fcc_lattice


def _random_config(n, L, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)


@pytest.mark.parametrize("n,L,seed", [(200, 7.0, 0), (500, 9.0, 1), (911, 11.0, 2)])
@pytest.mark.smoke
def test_neighbor_force_matches_all_pairs(n, L, seed):
    pos = jnp.asarray(_random_config(n, L, seed))
    box = Box.cubic(L)
    types = jnp.zeros(n, jnp.int32)
    params = lj_tables(1, r_cut=2.5)
    spec = CellSpec.create(L, n, r_cut=2.5, skin=0.4)
    nbr = build_neighbor_list(pos, box, spec)
    assert not bool(nbr.overflow)
    r_nb = neighbor_pair_force(pos, types, box, nbr, lj_kernel, params)
    r_ap = all_pairs_force(pos, types, box, lj_kernel, params, row_block=128)
    np.testing.assert_allclose(r_nb.energy, r_ap.energy, rtol=1e-5)
    np.testing.assert_allclose(r_nb.force, r_ap.force, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(r_nb.virial, r_ap.virial, rtol=1e-4)


@pytest.mark.smoke
def test_adversarial_dense_corner():
    """All particles crammed into one box corner (max cell occupancy)."""
    rng = np.random.default_rng(3)
    n, L = 256, 12.0
    pos = (rng.uniform(0, 2.0, (n, 3)) + L / 2 - 2.0).astype(np.float32)  # corner
    box = Box.cubic(L)
    pos = jnp.asarray(pos)
    types = jnp.zeros(n, jnp.int32)
    params = lj_tables(1, r_cut=2.0, shift=False)
    # deliberately generous capacities for the dense cluster
    spec = CellSpec.create(L, n, r_cut=2.0, skin=0.3,
                           cell_capacity=256, max_neighbors=256)
    nbr = build_neighbor_list(pos, box, spec)
    assert not bool(nbr.overflow)
    r_nb = neighbor_pair_force(pos, types, box, nbr, lj_kernel, params)
    r_ap = all_pairs_force(pos, types, box, lj_kernel, params, row_block=64)
    np.testing.assert_allclose(r_nb.energy, r_ap.energy, rtol=1e-4)
    np.testing.assert_allclose(r_nb.force, r_ap.force, rtol=2e-3, atol=2e-2)


def test_overflow_flag_raised():
    """Deliberately tiny capacities must raise the overflow flag, not crash."""
    pos = jnp.asarray(_random_config(300, 6.0, 4))
    box = Box.cubic(6.0)
    spec = CellSpec.create(6.0, 300, r_cut=2.5, skin=0.3,
                           cell_capacity=2, max_neighbors=8)
    nbr = build_neighbor_list(pos, box, spec)
    assert bool(nbr.overflow)


def test_rebuild_trigger():
    pos = jnp.asarray(_random_config(100, 8.0, 5))
    box = Box.cubic(8.0)
    spec = CellSpec.create(8.0, 100, r_cut=2.0, skin=0.4)
    nbr = build_neighbor_list(pos, box, spec)
    assert not bool(needs_rebuild(nbr, pos, box))
    moved = pos.at[7].add(jnp.asarray([0.21, 0.0, 0.0]))  # > skin/2
    assert bool(needs_rebuild(nbr, moved, box))
    moved_ok = pos + jnp.asarray([0.19, 0.0, 0.0])  # |d| just under skin/2
    assert not bool(needs_rebuild(nbr, moved_ok, box))


@pytest.mark.smoke
def test_exclusions():
    n, L = 64, 10.0
    pos = jnp.asarray(_random_config(n, L, 6))
    box = Box.cubic(L)
    bonds = np.asarray([[0, 1], [1, 2], [10, 20]], np.int32)
    excl = exclusions_from_bonds(bonds, n)
    spec = CellSpec.create(L, n, r_cut=3.0, skin=0.5, max_neighbors=n)
    nbr_x = build_neighbor_list(pos, box, spec, exclusions=excl)
    idx = np.asarray(nbr_x.idx)
    for a, b in bonds:
        assert b not in idx[a], (a, b)
        assert a not in idx[b], (a, b)
    # excluded pairs removed, everything else identical
    nbr = build_neighbor_list(pos, box, spec)
    for i in range(n):
        s_full = set(idx[i][idx[i] < n])
        s_ref = set(np.asarray(nbr.idx)[i][np.asarray(nbr.idx)[i] < n])
        extra = s_ref - s_full
        assert extra <= set(excl[i].tolist()), i


@pytest.mark.smoke
def test_md_with_neighbor_engine_matches_all_pairs(key):
    """Short NVT trajectory: neighbor engine == all-pairs engine (tight skin,
    frequent rebuilds) — the CPU↔GPU cross-check analog (SURVEY.md §4)."""
    pos = fcc_lattice(4, 1.6)  # 256 particles
    L = 4 * 1.6
    box = Box.cubic(L)
    n = pos.shape[0]
    system = make_system(n)
    params = lj_tables(1, r_cut=2.0)
    state0 = make_state(pos, box, vel=thermal_velocities(key, system.mass, 0.8))

    eng_ap = AllPairsEngine(system, pair_params=params, pair_kernel=lj_kernel,
                            row_block=256)
    eng_nb = NeighborEngine(
        system, CellSpec.create(L, n, r_cut=2.0, skin=0.6),
        params, lj_kernel, rebuild_every=5)

    results = []
    for eng in (eng_ap, eng_nb):
        st, aux = eng.init(state0)
        factory = lambda f: make_langevin_step(f, system, 0.004, 0.8, 1.0)

        @jax.jit
        def run(st, aux):
            return run_md_blocks(eng, factory, st, aux,
                                 jax.random.PRNGKey(42), 50)

        st, aux = run(st, aux)
        results.append((np.asarray(st.pos), np.asarray(st.vel), aux))
    p_ap, v_ap, _ = results[0]
    p_nb, v_nb, aux_nb = results[1]
    assert not bool(aux_nb.overflow) and not bool(aux_nb.stale)
    np.testing.assert_allclose(p_ap, p_nb, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(v_ap, v_nb, rtol=1e-3, atol=1e-3)


@pytest.mark.smoke
def test_overflow_corruption_confined():
    """Cell-capacity overflow must not evict particles from OTHER cells:
    neighbor rows of particles far from the overflowing cell must match a
    high-capacity reference build exactly."""
    L = 12.0
    box = Box.cubic(L)
    rng = np.random.default_rng(11)
    # cluster A: 12 particles inside one cell corner (overflows cap=4)
    a = (rng.uniform(0.0, 0.8, (12, 3)) - L / 2 + 0.5).astype(np.float32)
    # cluster B: a sparse 3x3x3 lattice (spacing 2.0 > cell width / 2, so
    # no cell holds more than a couple of B particles) in the far corner
    g = np.arange(3) * 2.0
    b = (np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
         + L / 2 - 5.5).astype(np.float32)
    b += rng.uniform(-0.2, 0.2, b.shape).astype(np.float32)
    pos = jnp.asarray(np.concatenate([a, b]))
    n = pos.shape[0]
    spec_lo = CellSpec.create(L, n, r_cut=2.0, skin=0.4, cell_capacity=4,
                              max_neighbors=40)
    spec_hi = CellSpec.create(L, n, r_cut=2.0, skin=0.4, cell_capacity=16,
                              max_neighbors=40)
    nbr_lo = build_neighbor_list(pos, box, spec_lo)
    nbr_hi = build_neighbor_list(pos, box, spec_hi)
    assert bool(nbr_lo.overflow) and not bool(nbr_hi.overflow)
    idx_lo = np.asarray(nbr_lo.idx)
    idx_hi = np.asarray(nbr_hi.idx)
    for i in range(12, n):  # cluster B rows: identical neighbor sets
        assert set(idx_lo[i][idx_lo[i] < n]) == set(idx_hi[i][idx_hi[i] < n])
