"""Triclinic boxes on the PACKED cell engine (the production hot path).

Reference parity: HOOMD's CellList/PotentialPair run triclinic in
production (BoxDim tilt factors; SURVEY.md §2b BoxDim + CellList rows).
The packed engine bins in FRACTIONAL coordinates and applies h-matrix
periodic shifts in the roll sweeps (ops/packed.py), so the same
cell-major layout covers tilted cells.

Oracles (cf. tests/test_triclinic.py for the all-pairs engine):
  1. differential — packed force == all-pairs force in the SAME tilted box;
  2. lattice reparametrization — the same fluid described in the ortho
     cell and in the unimodularly tilted cell h2 = h1 @ M gives identical
     energy/forces/order-CV values;
  3. dynamics — biased MD steps with repacks stay finite and wrapped.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import (
    Box, fractional, min_perpendicular_width, wrap)
from metadyn_tpu.core.state import make_system
from metadyn_tpu.ops.packed import (
    PackedSpec, pack, pack_host, packed_lj_force, repack_incremental,
)
from metadyn_tpu.ops.pairs import lj_tables, lj_kernel, all_pairs_force
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.utils.lattice import fcc_lattice, sc_lattice


def _tilted_fluid(n=500, L=13.0, tilt=(0.2, -0.15, 0.1), seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    box = Box.triclinic(L, L, L, *tilt)
    return pos, box


def test_packed_spec_triclinic_sizing():
    """Cell counts come from PERPENDICULAR widths: a strongly tilted cell
    must get fewer cells per tilted axis than its edge length suggests."""
    spec_o = PackedSpec.create(13.0, 100, r_cut=2.0, skin=0.4)
    spec_t = PackedSpec.create(13.0, 100, r_cut=2.0, skin=0.4,
                               tilt=(1.0, 0.0, 0.0))
    assert spec_o.cells_per_dim == (5, 5, 5)
    # xy=1.0: w_x = L/sqrt(2) ≈ 9.19 → floor(9.19/2.4) = 3
    assert spec_t.cells_per_dim[0] == 3
    assert spec_t.cells_per_dim[2] == 5


@pytest.mark.parametrize("use_host_pack", [False, True])
def test_packed_force_triclinic_matches_all_pairs(use_host_pack):
    """Packed roll-sweep force in a tilted box == all-pairs minimum-image
    oracle (fractional binning + h-matrix shifts are complete/correct)."""
    pos, box = _tilted_fluid()
    n = pos.shape[0]
    spec = PackedSpec.create(13.0, n, r_cut=2.0, skin=0.4, cap=16,
                             tilt=(0.2, -0.15, 0.1))
    packer = pack_host if use_host_pack else pack
    st, ovf = packer(pos, box, spec, jnp.zeros(n, jnp.int32),
                     jnp.ones(n), jnp.ones(n))
    assert not bool(ovf)
    st = packed_lj_force(st, spec)
    ref = all_pairs_force(jnp.asarray(pos), jnp.zeros(n, jnp.int32), box,
                          lj_kernel, lj_tables(1, r_cut=2.0), row_block=100)
    np.testing.assert_allclose(float(st.potential_energy),
                               float(ref.energy), rtol=1e-4)
    f_p = np.asarray(st.f[:, st.slot_of].T)
    scale = np.abs(np.asarray(ref.force)).max()
    np.testing.assert_allclose(f_p, np.asarray(ref.force),
                               rtol=1e-3, atol=1e-4 * scale)


def test_packed_host_pack_matches_traced_pack_triclinic():
    """pack_host (numpy twin) and the traced pack agree slot-for-slot in
    a tilted box (identical wrap + fractional binning)."""
    pos, box = _tilted_fluid(seed=3)
    n = pos.shape[0]
    spec = PackedSpec.create(13.0, n, r_cut=2.0, skin=0.4, cap=16,
                             tilt=(0.2, -0.15, 0.1))
    st_h, ovf_h = pack_host(pos, box, spec, jnp.zeros(n, jnp.int32),
                            jnp.ones(n), jnp.ones(n))
    st_t, ovf_t = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                       jnp.ones(n), jnp.ones(n))
    assert not bool(ovf_h) and not bool(ovf_t)
    np.testing.assert_array_equal(np.asarray(st_h.pid), np.asarray(st_t.pid))
    np.testing.assert_allclose(np.asarray(st_h.r), np.asarray(st_t.r),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(st_h.image),
                                  np.asarray(st_t.image))


def _reparam_pair(seed=2):
    """Same fluid in the ortho cell h1 = diag(L) and the tilted cell
    h2 = h1 @ [[1,1,0],[0,1,0],[0,0,1]] (xy = 1.0)."""
    L, nc = 13.0, 8
    rng = np.random.default_rng(seed)
    pos = (sc_lattice(nc, L / nc)[: nc ** 3]
           + rng.uniform(-0.3, 0.3, (nc ** 3, 3))).astype(np.float32)
    box1 = Box.cubic(L)
    box2 = Box.triclinic(L, L, L, xy=1.0)
    pos2 = np.asarray(wrap(jnp.asarray(pos), box2)[0])
    return pos, box1, pos2, box2


def test_packed_energy_invariant_under_reparametrization():
    """Packed LJ energy/forces identical between the orthorhombic and the
    unimodularly tilted description of the same periodic system."""
    pos1, box1, pos2, box2 = _reparam_pair()
    n = pos1.shape[0]
    assert 2.4 < 0.5 * float(np.min(np.asarray(
        min_perpendicular_width(box2))))
    out = []
    for pos, box, tilt in ((pos1, box1, None),
                           (pos2, box2, (1.0, 0.0, 0.0))):
        spec = PackedSpec.create(13.0, n, r_cut=2.0, skin=0.4, cap=24,
                                 tilt=tilt)
        st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                       jnp.ones(n), jnp.ones(n))
        assert not bool(ovf)
        st = packed_lj_force(st, spec)
        out.append((float(st.potential_energy),
                    np.asarray(st.f[:, st.slot_of].T)))
    (e1, f1), (e2, f2) = out
    np.testing.assert_allclose(e1, e2, rtol=2e-5)
    scale = np.abs(f1).max()
    np.testing.assert_allclose(f1, f2, atol=3e-3 * max(scale, 1.0))


def test_packed_order_cvs_invariant_under_reparametrization():
    """Q6 + coordination (fused roll sweep) are geometric functions of the
    point set — identical between the two descriptions of one system."""
    from metadyn_tpu.cv.packed_order import (
        PackedSteinhardtQl, PackedCoordination, make_fused_order_force)

    pos1, box1, pos2, box2 = _reparam_pair(seed=5)
    n = pos1.shape[0]
    system = make_system(n)
    vals = []
    for pos, box, tilt in ((pos1, box1, None),
                           (pos2, box2, (1.0, 0.0, 0.0))):
        spec = PackedSpec.create(13.0, n, r_cut=2.0, skin=0.4, cap=24,
                                 tilt=tilt)
        st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                       jnp.ones(n), jnp.ones(n))
        assert not bool(ovf)
        cvs = [PackedSteinhardtQl(spec=spec, r_cut=1.9, l=6, name="q6"),
               PackedCoordination(spec=spec, r0=1.5, r_cut=1.9, name="co")]
        values_fn, force_fn = make_fused_order_force(cvs, spec)
        s, ctx = values_fn(st)
        g = force_fn(st, ctx, jnp.asarray([1.0, 1.0], jnp.float32))
        vals.append((np.asarray(s), np.asarray(g.reshape(3, -1)
                                               [:, st.slot_of].T)))
    (s1, g1), (s2, g2) = vals
    np.testing.assert_allclose(s1, s2, rtol=5e-5, atol=1e-6)
    scale = np.abs(g1).max()
    np.testing.assert_allclose(g1, g2, atol=3e-3 * max(scale, 1e-9))


def test_packed_md_triclinic_steps_and_repacks():
    """Langevin MD + incremental repacks in a tilted cell: trajectory
    finite, no overflow, slot positions wrapped (fractionally) after
    repack, and total energy sane vs the all-pairs oracle at the end."""
    a = 1.75
    nc = 6
    pos = fcc_lattice(nc, a)
    n = pos.shape[0]
    L = nc * a
    tilt = (0.15, -0.1, 0.08)
    box = Box.triclinic(L, L, L, *tilt)
    spec = PackedSpec.create(L, n, r_cut=2.0, skin=0.5, cap=24, tilt=tilt)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n))
    assert not bool(ovf)
    force = lambda s: packed_lj_force(s, spec)
    st = force(st)
    step = make_packed_langevin_step(force, dt=0.004, kT=0.7, gamma=1.0)

    @jax.jit
    def block(st, key):
        def body(carry, i):
            s, bad = carry
            s = step(s, jax.random.fold_in(key, i))
            s, b = repack_incremental(s, spec)
            return (s, bad | b), 0
        (st, bad), _ = jax.lax.scan(body, (st, False), jnp.arange(60))
        return st, bad

    st, bad = block(st, jax.random.PRNGKey(0))
    assert not bool(bad), "overflow/lost particle during tilted MD"
    assert np.isfinite(float(st.potential_energy))
    live = np.asarray(st.pid) < n
    r = np.asarray(st.r)[:, live].T
    f = np.asarray(fractional(jnp.asarray(r), box))
    assert (np.abs(f) <= 0.5 + 1e-4).all(), "repack left unwrapped slots"
    # end-state force differential vs all-pairs in the same box
    ref = all_pairs_force(jnp.asarray(r),
                          jnp.zeros(live.sum(), jnp.int32), box,
                          lj_kernel, lj_tables(1, r_cut=2.0), row_block=108)
    st2 = force(st)
    e_packed = float(st2.potential_energy)
    np.testing.assert_allclose(e_packed, float(ref.energy), rtol=2e-4)


def test_packed_lamellar_msd_triclinic_reparam():
    """Packed lamellar CV at reparametrized Miller rows and the MSD CV
    (h-matrix unwrap) both agree between the two descriptions."""
    from metadyn_tpu.cv.packed import (
        PackedLamellar, PackedMSD, msd_reference_attrs)

    pos1, box1, pos2, box2 = _reparam_pair(seed=7)
    n = pos1.shape[0]
    system = make_system(n)
    M = np.array([[1, 1, 0], [0, 1, 0], [0, 0, 1]])
    n1 = np.array([[2, 0, 0], [0, 1, 0]])
    vals = {}
    # both descriptions get the SAME unwrapped Cartesian input (pack wraps
    # internally, tracking images): the MSD unwrap must reconstruct it
    for key, (pos, box, tilt, miller) in {
        "ortho": (pos1, box1, None, n1),
        "tilted": (pos1, box2, (1.0, 0.0, 0.0), n1 @ M),
    }.items():
        spec = PackedSpec.create(13.0, n, r_cut=2.0, skin=0.4, cap=24,
                                 tilt=tilt)
        cv = PackedLamellar.create(miller, n_real=n, name="lam")
        msd = PackedMSD(n_real=n, name="msd")
        attrs = {"lam_lam": np.ones(n, np.float32)}
        attrs.update(msd_reference_attrs(pos1))  # shared Cartesian refs
        st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                       jnp.ones(n), jnp.ones(n), extra_attrs=attrs)
        assert not bool(ovf)
        vals[key] = (float(cv.value(st, system)),
                     float(msd.value(st, system)))
    np.testing.assert_allclose(vals["ortho"][0], vals["tilted"][0],
                               atol=2e-5)
    np.testing.assert_allclose(vals["ortho"][1], vals["tilted"][1],
                               rtol=1e-4, atol=1e-5)
