"""Fully-fused Pallas MD+CV kernel: LJ pair force + order-CV bias force +
fresh CV value sums in ONE Newton-halved cell traversal.

Reference parity: the reference evaluates pair forces, each CV value and
each CV bias force in SEPARATE CUDA kernels per step (recalled
``IntegratorMetaDynamics::update`` loop, SURVEY.md §3.1).  On TPU the
multiple-time-stepped bias schedule (sampler.make_stride_chunk,
``bias_every`` > 1) makes a deeper fusion natural: the trailing force
call of the LAST MD step of each MTS sub-chunk computes

  * the LJ pair force at the new positions (exact, as every step),
  * the order-CV bias force at the new positions, using ∂V/∂s and the
    outer CV gradient from the PREVIOUS evaluation (one-sub-chunk lag —
    the same slowly-varying-bias approximation MTS already makes, with
    geometry strictly fresher than doubling ``bias_every``),
  * the CV value sums at the new positions (feeding the NEXT sub-chunk's
    ∂V/∂s — so no separate value sweep ever runs in the hot loop).

All three share one set of rolled partner stacks, one pair-geometry
computation and one kernel launch; per 5-step sub-chunk this replaces
[5 pair kernels + 1 value kernel + 1 force kernel] with [4 pair kernels
+ 1 fused kernel] (measured round 4: 7.7 → ~5.7 ms per sub-chunk at
Config-3 scale).

CV math enters in the homogeneous-monomial basis (cv/ylm_mono.py): the
kernel accumulates Σ w·mono_l(u) (values) and contracts three static
per-eval coefficient vectors (forces) — ~2× fewer VPU ops/pair than the
per-m recurrence of ops/packed_order_pallas.py, which remains the
non-lagged production path and cross-check.

Supported state layout: the lean sentinel mode only (uniform_sigma AND
uniform_eps set, no bonds) — the layout of the perf-critical order-CV
configs.  General layouts stay on the split kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cv.ylm_mono import build_monomials, n_mono
from .packed import PackedSpec, PackedState, VACANT_X
from .packed_order_pallas import _order_stacks, _tile
from .packed_pallas2 import _half_offsets, _roll_cells_flat


def _lane_layout(cvs, mono: bool):
    """(aux lane offsets, value lane offsets, totals) for the CV list.

    In mono mode sphere-poly CVs (``cv.sphere_poly``) use 3·n_mono(l−1)
    aux lanes (bx, by, bz) and n_mono(l)+1 value lanes (monomial sums +
    bond count); in recurrence mode (and for radial CVs) the flat-scalar
    protocol sizes apply."""
    aux_off, val_off = [], []
    na = nv = 0
    for cv in cvs:
        aux_off.append(na)
        val_off.append(nv)
        if mono and getattr(cv, "sphere_poly", False):
            na += 3 * n_mono(cv.l - 1)
            nv += n_mono(cv.l) + 1
        else:
            na += cv.aux_size
            nv += cv.n_value_terms
    assert na <= 128 and nv <= 128, (na, nv)
    return aux_off, val_off, na, nv


def _kernel(xi, yi, zi, auxl, *refs,
            cap: int, cvs, rc2: float, usig: float, ueps: float,
            mono: bool = False,
            parts: frozenset = frozenset({"lj", "vals", "force"}),
            masked: bool = False):
    refs = list(refs)
    # per-i-CELL value weight (spatial DD: interior=1/ghost=0 — each
    # global pair's value counted on exactly one device; see
    # packed_order_pallas._values_kernel).  MONO mode only: there values
    # and forces use separate weights (wt vs wq/nonself), so masking wt
    # leaves the j-side force reactions of ghost-i pairs intact.
    im = refs.pop(0) if masked else None
    xj, yj, zj = refs[:3]
    del refs[:3]
    (fx, fy, fz, gx_o, gy_o, gz_o,
     fjx, fjy, fjz, gjx, gjy, gjz, vals) = refs
    ct = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        for ref in (fx, fy, fz, gx_o, gy_o, gz_o):
            ref[...] = jnp.zeros_like(ref)

    @pl.when((o == 0) & (ct == 0))
    def _init_vals():
        vals[...] = jnp.zeros_like(vals)

    aux_off, val_off, _, n_vals = _lane_layout(cvs, mono)
    # per-CV static-per-eval scalars from the lane-packed input
    cv_aux = []
    for cv, off in zip(cvs, aux_off):
        if mono and getattr(cv, "sphere_poly", False):
            nb = n_mono(cv.l - 1)
            cv_aux.append(tuple(
                [auxl[0, off + a * nb + k] for k in range(nb)]
                for a in range(3)))
        else:
            cv_aux.append(cv.aux_from_flat(
                [auxl[0, off + i] for i in range(cv.aux_size)]))

    x_i = xi[...]
    y_i = yi[...]
    z_i = zi[...]
    z = jnp.zeros_like(x_i)
    is_self = o == 0
    # value weight: cross-offset pairs enumerated once (×2 Newton); the
    # self offset enumerates both orders (×1) — _values_kernel parity
    wt = jnp.where(is_self, 1.0, 2.0)
    if im is not None:
        assert mono, "cell_mask requires the monomial math mode"
        wt = wt * im[0:1, :]
    # j-side reactions only on cross offsets (self: i gets both orders)
    wj = jnp.where(is_self, 0.0, 1.0)

    CH = 8
    assert cap % CH == 0

    def chunk_body(jc, carry):
        (afx, afy, afz, agx, agy, agz), vacc = carry
        j0 = pl.multiple_of(jc * CH, CH)
        xs = xj[0, pl.ds(j0, CH), :]
        ys = yj[0, pl.ds(j0, CH), :]
        zs = zj[0, pl.ds(j0, CH), :]
        for k in range(CH):
            dx = x_i - xs[k, :][None, :]
            dy = y_i - ys[k, :][None, :]
            dz = z_i - zs[k, :][None, :]
            r2 = dx * dx + dy * dy + dz * dz
            nonself = r2 > 1e-12
            # --- LJ pair force (sentinel culling: see packed_pallas2) ---
            if "lj" in parts:
                inside = (r2 < rc2) & nonself
                inv = jnp.where(inside, 1.0, 0.0) / jnp.where(inside, r2, 1.0)
                s2 = (usig * usig) * inv
                s6 = s2 * s2 * s2
                coef = 4.0 * ueps * (12.0 * s6 * s6 - 6.0 * s6) * inv
                tx = coef * dx
                ty = coef * dy
                tz = coef * dz
                afx = afx + tx
                afy = afy + ty
                afz = afz + tz
                fjx[0, j0 + k, :] = -wj * jnp.sum(tx, axis=0)
                fjy[0, j0 + k, :] = -wj * jnp.sum(ty, axis=0)
                fjz[0, j0 + k, :] = -wj * jnp.sum(tz, axis=0)
            else:
                # debug/timing mode without "lj": the j-side outputs must
                # still be initialized or rollback() folds VMEM garbage
                zr = jnp.zeros_like(x_i[0])
                fjx[0, j0 + k, :] = zr
                fjy[0, j0 + k, :] = zr
                fjz[0, j0 + k, :] = zr
            # --- CV geometry ---
            r2s = jnp.where(nonself, r2, 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            ux = dx * inv_r
            uy = dy * inv_r
            uz = dz * inv_r
            mono_cache = {}
            bgx = bgy = bgz = jnp.float32(0.0) * x_i
            new_v = list(vacc)
            for cv, aux, voff in zip(cvs, cv_aux, val_off):
                if (getattr(cv, "sphere_poly", False) and not mono
                        and parts >= {"vals", "force"}):
                    # recurrence mode: interleaved value+force with shared
                    # P_lm / u^m chains (cv.pair_value_and_grad)
                    wv = wt * nonself.astype(jnp.float32)
                    flat, ax, ay, az = cv.pair_value_and_grad(
                        dx, dy, dz, r2, wv, aux)
                    for t, f in enumerate(flat):
                        new_v[voff + t] = new_v[voff + t] + f
                    bgx = bgx + ax
                    bgy = bgy + ay
                    bgz = bgz + az
                elif getattr(cv, "sphere_poly", False) and not mono:
                    # recurrence mode, partial (debug timing only)
                    wv = wt * nonself.astype(jnp.float32)
                    if "vals" in parts:
                        flat = cv.pair_value_terms_flat(dx, dy, dz, r2, wv)
                        for t, f in enumerate(flat):
                            new_v[voff + t] = new_v[voff + t] + f
                    if "force" in parts:
                        ax, ay, az = cv.pair_grad_terms(dx, dy, dz, r2, aux)
                        nf = nonself.astype(jnp.float32)
                        bgx = bgx + nf * ax
                        bgy = bgy + nf * ay
                        bgz = bgz + nf * az
                elif getattr(cv, "sphere_poly", False):
                    wq = ((r2 < cv.r_cut ** 2) & nonself).astype(jnp.float32)
                    if "vals" in parts:
                        ml = build_monomials(cv.l, ux, uy, uz, mono_cache)
                        wv = wt * wq
                        for t in range(len(ml)):
                            new_v[voff + t] = (new_v[voff + t]
                                               + jnp.sum(wv * ml[t]))
                        new_v[voff + len(ml)] = (new_v[voff + len(ml)]
                                                 + jnp.sum(wv))
                    if "force" in parts:
                        ml1 = build_monomials(cv.l - 1, ux, uy, uz,
                                              mono_cache)
                        bx, by, bz = aux
                        gux = guy = guz = jnp.float32(0.0)
                        for t in range(len(ml1)):
                            gux = gux + bx[t] * ml1[t]
                            guy = guy + by[t] * ml1[t]
                            guz = guz + bz[t] * ml1[t]
                        dot = ux * gux + uy * guy + uz * guz
                        bgx = bgx + wq * ((gux - ux * dot) * inv_r)
                        bgy = bgy + wq * ((guy - uy * dot) * inv_r)
                        bgz = bgz + wq * ((guz - uz * dot) * inv_r)
                else:
                    if "vals" in parts:
                        wr = wt * nonself.astype(jnp.float32)
                        flat = cv.pair_value_terms_flat(dx, dy, dz, r2, wr)
                        for t, f in enumerate(flat):
                            new_v[voff + t] = new_v[voff + t] + f
                    if "force" in parts:
                        ax, ay, az = cv.pair_grad_terms(dx, dy, dz, r2, aux)
                        nf = nonself.astype(jnp.float32)
                        bgx = bgx + nf * ax
                        bgy = bgy + nf * ay
                        bgz = bgz + nf * az
            agx = agx + bgx
            agy = agy + bgy
            agz = agz + bgz
            gjx[0, j0 + k, :] = -wj * jnp.sum(bgx, axis=0)
            gjy[0, j0 + k, :] = -wj * jnp.sum(bgy, axis=0)
            gjz[0, j0 + k, :] = -wj * jnp.sum(bgz, axis=0)
            vacc = tuple(new_v)
        return (afx, afy, afz, agx, agy, agz), vacc

    (afx, afy, afz, agx, agy, agz), vacc = jax.lax.fori_loop(
        0, cap // CH, chunk_body,
        ((z, z, z, z, z, z), (jnp.float32(0.0),) * n_vals))

    fx[...] += afx
    fy[...] += afy
    fz[...] += afz
    gx_o[...] += agx
    gy_o[...] += agy
    gz_o[...] += agz
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    add = jnp.zeros_like(vals)
    for t in range(n_vals):
        add = add + jnp.where(lane == t, vacc[t], 0.0)
    vals[...] += add


def pack_force_aux(cvs, auxs, mono: bool):
    """(1, 128) aux-lane vector for :func:`fused_lj_order_force`: sphere
    CVs contribute their three monomial force vectors (D_α·Cᵀ·aux) in
    mono mode or their raw grad_aux scalars in recurrence mode; radial
    CVs their flat aux scalars."""
    lanes = []
    for cv, aux in zip(cvs, auxs):
        if mono and getattr(cv, "sphere_poly", False):
            bx, by, bz = cv.mono_force_vecs(aux)
            lanes += [bx, by, bz]
        else:
            lanes.append(jnp.stack([jnp.asarray(a, jnp.float32)
                                    for a in cv.aux_flat(aux)]))
    flat = jnp.concatenate(lanes)
    return jnp.concatenate(
        [flat, jnp.zeros(128 - flat.shape[0], jnp.float32)])[None, :]


def decode_value_lanes(cvs, vals, mono: bool):
    """Kernel value lanes → per-CV ``terms`` tuples (the XLA sweep's
    structure: (re, im, nb) for Q_l, flat tuples for radial CVs)."""
    _, val_off, _, _ = _lane_layout(cvs, mono)
    terms = []
    for cv, off in zip(cvs, val_off):
        if mono and getattr(cv, "sphere_poly", False):
            nm = n_mono(cv.l)
            mono_sums = vals[off:off + nm]
            nb = vals[off + nm]
            terms.append(cv.mono_value_decode(mono_sums, nb))
        else:
            terms.append(cv.terms_from_flat(
                tuple(vals[off + i] for i in range(cv.n_value_terms))))
    return tuple(terms)


def fused_lj_order_force(state: PackedState, spec: PackedSpec, cvs, auxs,
                         parts=frozenset({"lj", "vals", "force"}),
                         mono: bool = False, cell_mask=None):
    """One traversal → (f_lj (3, Npad), g_bias (3, Npad), terms).

    ``auxs``: per-CV ``grad_aux`` outputs (the bias coefficients, usually
    from the PREVIOUS evaluation's terms — the MTS lag).  ``terms`` are
    the FRESH value sums at the current positions, structured exactly
    like the split kernels' (feed them to the next ``grad_aux``).

    ``cell_mask`` (C,) — the spatial-DD hook (requires ``mono=True``):
    value sums weight every pair by its i-CELL (interior=1/ghost=0 on a
    halo-extended local grid); the LJ and bias FORCES stay unmasked (the
    caller discards ghost rows; j-side reactions onto the interior are
    kept — the pair-island ghost-discard proof)."""
    assert spec.uniform_eps is not None and spec.uniform_sigma is not None, (
        "fused LJ+CV kernel requires the lean sentinel layout")
    assert not spec.has_bonds, "fused LJ+CV kernel: bonded specs unsupported"
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    raw, vi = _order_stacks(state, spec)
    assert vi is None
    aux_lanes = pack_force_aux(cvs, auxs, mono)
    _, _, _, n_vals = _lane_layout(cvs, mono)
    cap8, n_ct, CT, Cpad = _tile(spec, live_rows=260)

    def pad(a, cap_axis, c_axis, fill):
        pads = [(0, 0)] * a.ndim
        pads[cap_axis] = (0, cap8 - cap)
        pads[c_axis] = (0, Cpad - C)
        return jnp.pad(a, pads, constant_values=fill)

    slabs = [pad(s, 1, 2, VACANT_X) for s in raw]
    const = [pad(state.r[d].reshape(cap, C), 0, 1, VACANT_X)
             for d in range(3)]
    mask_in = []
    if cell_mask is not None:
        assert mono, "cell_mask requires mono=True (see _kernel)"
        mask_in = [jnp.broadcast_to(
            jnp.pad(jnp.asarray(cell_mask, jnp.float32),
                    (0, Cpad - C))[None, :], (8, Cpad))]

    const_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                              memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((8, CT), lambda ct, o: (0, ct),
                             memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                             memory_space=pltpu.VMEM)
    fi_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                           memory_space=pltpu.VMEM)
    fj_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                           memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, 128), lambda ct, o: (0, 0),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, cap=cap8, cvs=tuple(cvs), rc2=float(spec.r_cut) ** 2,
        usig=float(spec.uniform_sigma), ueps=float(spec.uniform_eps),
        mono=mono, parts=frozenset(parts), masked=cell_mask is not None)
    outs = pl.pallas_call(
        kern,
        grid=(n_ct, 14),
        in_specs=([const_spec] * 3 + [lane_spec]
                  + [mask_spec] * len(mask_in) + [slab_spec] * 3),
        out_specs=([fi_spec] * 6 + [fj_spec] * 6 + [lane_spec]),
        out_shape=([jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32)] * 6
                   + [jax.ShapeDtypeStruct((14, cap8, Cpad), jnp.float32)] * 6
                   + [jax.ShapeDtypeStruct((1, 128), jnp.float32)]),
    )(*const, aux_lanes, *mask_in, *slabs)
    fx, fy, fz, gxo, gyo, gzo = outs[:6]
    fjx, fjy, fjz, gjx, gjy, gjz = outs[6:12]
    vals = outs[12][0]

    offs = _half_offsets()
    dims = (cx, cy, cz)

    def rollback(fi, fj):
        tot = fi[:cap, :C]
        for oi, o in enumerate(offs[1:], start=1):
            tot = tot + _roll_cells_flat(
                fj[oi, :cap, :C], (-o[0], -o[1], -o[2]), dims)
        return tot.reshape(-1)

    f_lj = jnp.stack([rollback(fx, fjx), rollback(fy, fjy),
                      rollback(fz, fjz)])
    g = jnp.stack([rollback(gxo, gjx), rollback(gyo, gjy),
                   rollback(gzo, gjz)])
    return f_lj, g, decode_value_lanes(cvs, vals, mono)
