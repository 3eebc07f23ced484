"""Fused LJ+CV kernel (ops/packed_fused_pallas) + monomial Y_lm machinery.

Oracle chain: the XLA roll sweep (cv/packed_order) is the reference for
CV values/forces (itself vjp-oracle-tested in test_packed.py); the
Newton-halved pair kernel (packed_pallas2, oracle-tested against the
full sweep) is the reference for the LJ force.  Both fused-kernel modes
(per-m recurrence and homogeneous-monomial) must match them.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from metadyn_tpu.core.box import Box
from metadyn_tpu.ops.packed import PackedSpec, pack
from metadyn_tpu.utils.lattice import fcc_lattice


# ---------------------------------------------------------------------------
# monomial machinery (pure numpy/static — no pallas)

def test_ylm_mono_matrix_matches_recurrence():
    from metadyn_tpu.cv.ylm_mono import ylm_mono_matrix, build_monomials
    from metadyn_tpu.cv.steinhardt import _plm_over_sinm_coeffs, _norms

    rng = np.random.default_rng(1)
    for l in (4, 6, 8):
        d = rng.normal(size=(500, 3))
        u = d / np.linalg.norm(d, axis=1)[:, None]
        ux, uy, uz = u.T
        coeffs = _plm_over_sinm_coeffs(l)
        norms = _norms(l).astype(np.float64)
        pr, pi = np.ones_like(uz), np.zeros_like(uz)
        ref = []
        for m in range(l + 1):
            plv = np.zeros_like(uz)
            for a in coeffs[m][::-1]:
                plv = plv * uz + a
            ref.append(norms[m] * plv * pr)
            ref.append(norms[m] * plv * pi)
            pr, pi = pr * ux - pi * uy, pr * uy + pi * ux
        ref = np.stack(ref[0::2] + ref[1::2])
        C = ylm_mono_matrix(l)
        got = C @ np.stack(build_monomials(l, ux, uy, uz))
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_mono_force_vecs_match_closed_form_grad():
    """b-vector contraction == pair_grad_terms (the closed-form dY_lm
    force, itself vjp-oracle-tested) for random aux coefficients."""
    from metadyn_tpu.cv.ylm_mono import build_monomials
    from metadyn_tpu.cv.packed_order import PackedSteinhardtQl

    spec = PackedSpec.create(12.0, 100, r_cut=2.5, skin=0.5, cap=8)
    cv = PackedSteinhardtQl(spec=spec, r_cut=1.8, l=6)
    rng = np.random.default_rng(2)
    aux = (list(jnp.asarray(rng.normal(size=7), jnp.float32)),
           list(jnp.asarray(rng.normal(size=7), jnp.float32)))
    d = jnp.asarray(rng.normal(size=(400, 3)) * 0.6, jnp.float32)
    r2 = jnp.sum(d * d, axis=1)
    gx, gy, gz = cv.pair_grad_terms(d[:, 0], d[:, 1], d[:, 2], r2, aux)

    bx, by, bz = cv.mono_force_vecs(aux)
    inv_r = 1.0 / jnp.sqrt(r2)
    u = d * inv_r[:, None]
    m5 = jnp.stack(build_monomials(5, u[:, 0], u[:, 1], u[:, 2]))
    gux, guy, guz = bx @ m5, by @ m5, bz @ m5
    dot = u[:, 0] * gux + u[:, 1] * guy + u[:, 2] * guz
    inside = r2 < cv.r_cut ** 2
    ref = [jnp.where(inside, (g - u[:, i] * dot) * inv_r, 0.0)
           for i, g in enumerate((gux, guy, guz))]
    scale = float(jnp.abs(jnp.stack(ref)).max())
    for a, b in zip((gx, gy, gz), ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5 * scale, rtol=2e-4)


def test_pair_value_and_grad_matches_split_methods():
    """The interleaved (shared-chain) method == value_terms + grad_terms."""
    from metadyn_tpu.cv.packed_order import PackedSteinhardtQl

    spec = PackedSpec.create(12.0, 100, r_cut=2.5, skin=0.5, cap=8)
    cv = PackedSteinhardtQl(spec=spec, r_cut=1.8, l=6)
    rng = np.random.default_rng(3)
    aux = (list(jnp.asarray(rng.normal(size=7), jnp.float32)),
           list(jnp.asarray(rng.normal(size=7), jnp.float32)))
    d = jnp.asarray(rng.normal(size=(300, 3)) * 0.6, jnp.float32)
    r2 = jnp.sum(d * d, axis=1)
    w = jnp.asarray(rng.integers(0, 2, 300), jnp.float32) * 2.0

    flat, gx, gy, gz = cv.pair_value_and_grad(
        d[:, 0], d[:, 1], d[:, 2], r2, w, aux)
    flat_ref = cv.pair_value_terms_flat(d[:, 0], d[:, 1], d[:, 2], r2, w)
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-5)
    rg = cv.pair_grad_terms(d[:, 0], d[:, 1], d[:, 2], r2, aux)
    nonself = (r2 > 1e-12).astype(jnp.float32)
    for a, b in zip((gx, gy, gz), rg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(nonself * b),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fused kernel vs split oracles (interpret mode)

def _case():
    a_lat = 1.62
    pos = fcc_lattice(6, a_lat)
    n = pos.shape[0]
    L = 6 * a_lat
    rng = np.random.default_rng(5)
    pos = pos + rng.normal(0, 0.08, pos.shape).astype(np.float32)
    box = Box.cubic(L)
    spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.4, cap=40,
                             uniform_sigma=1.0, uniform_eps=1.0)
    st, ovf = pack(pos, box, spec, jnp.zeros(n, jnp.int32),
                   jnp.ones(n), jnp.ones(n))
    assert not bool(ovf)
    from metadyn_tpu.cv.packed_order import (PackedCoordination,
                                             PackedSteinhardtQl)
    nn = a_lat / np.sqrt(2)
    cvs = [PackedSteinhardtQl(spec=spec, r_cut=nn * 1.2, l=6, name="q6"),
           PackedCoordination(spec=spec, r0=nn * 1.35, name="co",
                              r_cut=nn * 1.35 * 1.5)]
    return spec, st, cvs


@pytest.mark.parametrize("mono", [False, True],
                         ids=["recurrence", "monomial"])
def test_fused_kernel_matches_split_oracles(mono):
    import metadyn_tpu.ops.packed_fused_pallas as pfp
    import metadyn_tpu.ops.packed_pallas2 as pp2
    from metadyn_tpu.cv.packed_order import make_fused_order_force

    spec, st, cvs = _case()
    v_x, f_x = make_fused_order_force(cvs, spec, use_pallas=False)
    s_x, (terms_x, _) = v_x(st)
    dV = jnp.asarray([0.9, -1.3], jnp.float32)
    auxs = [cv.grad_aux(t, dV[i])
            for i, (cv, t) in enumerate(zip(cvs, terms_x))]
    g_x = np.asarray(f_x(st, (terms_x, None), dV))

    orig = pl.pallas_call
    patch = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    pfp.pl.pallas_call = patch
    pp2.pl.pallas_call = patch
    try:
        flj_ref = np.asarray(
            pp2.packed_lj_force_pallas2(st, spec, with_energy=False).f)
        f_lj, g, terms = pfp.fused_lj_order_force(st, spec, cvs, auxs,
                                                  mono=mono)
    finally:
        pfp.pl.pallas_call = orig
        pp2.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(f_lj), flj_ref,
                               atol=1e-3 * np.abs(flj_ref).max())
    np.testing.assert_allclose(np.asarray(g), g_x,
                               rtol=2e-3, atol=2e-4 * np.abs(g_x).max())
    s = [float(cv.finalize_value(t)) for cv, t in zip(cvs, terms)]
    np.testing.assert_allclose(s, np.asarray(s_x), rtol=2e-4)


@pytest.mark.smoke
@pytest.mark.slow
def test_lagged_sampler_matches_exact_mts():
    """MetadSampler(mts_lag=True) tracks the exact-MTS trajectory: same
    seed, 40 steps, CV endpoints equal to ~1e-4 (the lag perturbation is
    below the f32 force noise at this horizon)."""
    import metadyn_tpu.ops.packed_fused_pallas as pfp
    import metadyn_tpu.ops.packed_order_pallas as pop
    import metadyn_tpu.ops.packed_pallas2 as pp2
    from metadyn_tpu.core.packed_engine import PackedEngine
    from metadyn_tpu.core.state import make_system
    from metadyn_tpu.integrate.packed import make_packed_langevin_step
    from metadyn_tpu.cv.packed_order import (PackedCoordination,
                                             PackedSteinhardtQl)
    from metadyn_tpu.bias.grid import GridSpec
    from metadyn_tpu.bias.metad import HillSpec, WELL_TEMPERED
    from metadyn_tpu.sampler import MetadSampler

    a_lat = 1.62
    pos = fcc_lattice(6, a_lat)
    n = pos.shape[0]
    L = 6 * a_lat
    rng = np.random.default_rng(3)
    pos = pos + rng.normal(0, 0.05, pos.shape).astype(np.float32)
    box = Box.cubic(L)
    system = make_system(n)
    nn = a_lat / np.sqrt(2)

    orig = pl.pallas_call
    patch = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    pfp.pl.pallas_call = patch
    pop.pl.pallas_call = patch
    pp2.pl.pallas_call = patch

    def make(lag):
        spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.4, cap=40,
                                 uniform_sigma=1.0, uniform_eps=1.0)
        engine = PackedEngine(spec, rebuild_every=10, use_pallas=True)
        st, ovf = engine.pack_state(pos, box, jnp.zeros(n, jnp.int32),
                                    jnp.ones(n), jnp.ones(n))
        assert not bool(ovf)
        cvs = [PackedSteinhardtQl(spec=spec, r_cut=nn * 1.2, l=6,
                                  name="q6"),
               PackedCoordination(spec=spec, r0=nn * 1.35, name="co",
                                  r_cut=nn * 1.35 * 1.5)]
        grid = GridSpec.create([0.0, 4.0], [0.7, 28.0], [32, 32],
                               [0.02, 0.5])
        return MetadSampler(
            system, st, engine, cvs=cvs, grid_spec=grid,
            hills=HillSpec.create(W=0.4, stride=20, mode=WELL_TEMPERED,
                                  deltaT=5.0),
            integrator_factory=lambda f: make_packed_langevin_step(
                f, dt=0.004, kT=0.7, gamma=1.0),
            seed=0, chunks_per_block=1, bias_every=5, mts_lag=lag)

    try:
        res = {}
        for lag in (False, True):
            s = make(lag)
            hist = s.run(40)
            m = hist[-1]
            assert not bool(m["nlist_overflow"])
            assert np.isfinite(np.asarray(m["cv"])).all()
            from metadyn_tpu.ops.packed import assert_no_vacant_drift
            assert_no_vacant_drift(s.state, s.engine.spec)
            res[lag] = np.asarray(m["cv"])
        np.testing.assert_allclose(res[True], res[False], rtol=2e-3,
                                   atol=2e-3)
    finally:
        pfp.pl.pallas_call = orig
        pop.pl.pallas_call = orig
        pp2.pl.pallas_call = orig
