"""Newton-halved Pallas pair-force kernel (v2 of ops/packed_pallas.py).

Newton's 3rd law halves the pair sweep: only the self offset plus the 13
lexicographically-positive neighbor offsets are enumerated; each pair
contributes +coef·dr to the i row and −coef·dr to the j row.  The j-side
forces are accumulated in the ROLLED frame (one (cap, C) stack slot per
offset) and rolled back + summed in a cheap XLA post-pass.

Energy/virial weights: non-self offsets count each unordered pair once
(weight 1); the self offset still enumerates both orders (weight ½).

Everything else (C-tiling, 8-row slabs, consecutive revisiting, bonds via
partner-pid matching) matches packed_pallas.py, which remains the
reference implementation for cross-checks.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import PackedSpec, PackedState, _fene_wca_pair, shift_rows_cart


def _half_offsets():
    """Self + the 13 offsets with (ox, oy, oz) lexicographically positive."""
    offs = [(0, 0, 0)]
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                if (ox, oy, oz) > (0, 0, 0):
                    offs.append((ox, oy, oz))
    return offs


@functools.lru_cache(maxsize=None)
def _flat_roll_plan(o, dims):
    """Static plan for one periodic cell-offset roll in FLAT (cap, C) layout.

    out[.., c] = a[.., flat((ix+ox)%cx, (iy+oy)%cy, (iz+oz)%cz)] decomposes
    into at most 4 flat rolls selected by static per-column wrap masks:
    flat_src = c + S − yw·(cy·cz) − zw·cz  (mod C), with S = ox·cy·cz +
    oy·cz + oz — the x wrap is FREE mod C.  This keeps every copy in the
    (cap, C) lane layout (C ≈ 21×128, ~3% pad) instead of the 4-d
    (cap, cx, cy, cz) view whose cz→128 lane pad makes each roll move ~10×
    the live bytes (docs/perf_notes.md).

    Returns [(shift, mask_or_None)] applied as: out = roll(a, −shift₀);
    then for each further (shift, mask): out = where(mask, roll(a, −shift), out).
    """
    cx, cy, cz = dims
    C = cx * cy * cz
    ox, oy, oz = o
    S = ox * cy * cz + oy * cz + oz
    ix, iy, iz = np.unravel_index(np.arange(C), dims)
    mz = (iz + oz >= cz) | (iz + oz < 0)
    my = (iy + oy >= cy) | (iy + oy < 0)
    zc = int(np.sign(oz)) * cz
    yc = int(np.sign(oy)) * cy * cz
    # masks stay numpy: the plan is lru_cached across jit traces, and a jnp
    # constant minted inside one trace would leak into the next
    plan = [(S % C, None)]
    if oz != 0:
        plan.append(((S - zc) % C, mz))
    if oy != 0:
        plan.append(((S - yc) % C, my & ~mz))
        if oz != 0:
            plan.append(((S - yc - zc) % C, my & mz))
    return plan


def _roll_cells_flat(a, o, dims):
    """Periodic cell-offset roll of a (..., C) flat cell-major array.

    Exact drop-in for jnp.roll(a.reshape(.., cx, cy, cz), shift=(-ox,-oy,-oz),
    axis=(-3,-2,-1)).reshape(.., C) without ever entering the lane-padded
    4-d layout (parity asserted in tests/test_packed.py)."""
    plan = _flat_roll_plan(tuple(o), tuple(dims))
    out = jnp.roll(a, shift=-plan[0][0], axis=-1)
    for shift, mask in plan[1:]:
        out = jnp.where(jnp.asarray(mask), jnp.roll(a, shift=-shift, axis=-1), out)
    return out


def _half_stacks(state: PackedState, spec: PackedSpec):
    """(14, cap, C) rolled+shifted partner stacks for the half-offset set."""
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    dims = (cx, cy, cz)
    offs = _half_offsets()
    ix, iy, iz = np.unravel_index(np.arange(C), dims)

    ushifts = []
    for (ox, oy, oz) in offs:
        sx = ((ix + ox) // cx).astype(np.float32)
        sy = ((iy + oy) // cy).astype(np.float32)
        sz = ((iz + oz) // cz).astype(np.float32)
        ushifts.append(np.stack([sx, sy, sz]))
    # (14, 3, C) lattice wrap counts → Cartesian shifts (tilt-aware)
    shift = shift_rows_cart(np.stack(ushifts), state.box)

    stacks = []
    for d in range(3):
        x2 = state.r[d].reshape(cap, C)
        rolled = jnp.stack([_roll_cells_flat(x2, o, dims) for o in offs])
        stacks.append(rolled + shift[:, d][:, None, :])
    # uniform-sigma systems skip the hs stack: sig is a compile-time const
    # and se (= √ε, 0 on vacant slots) carries the vacancy mask — unless
    # uniform_eps is ALSO set, in which case vacancy is encoded by the
    # coordinate sentinel (ops/packed.VACANT_X) and se is skipped too
    extra = []
    if spec.uniform_eps is None:
        extra.append(state.attrs["se"])
    if spec.uniform_sigma is None:
        extra.append(state.attrs["hs"])
    if spec.has_pair_table:
        extra.append(state.typ.astype(jnp.float32))
    if spec.has_bonds:
        extra.append(state.pid.astype(jnp.float32))
    for arr in extra:
        a2 = arr.reshape(cap, C)
        stacks.append(jnp.stack([_roll_cells_flat(a2, o, dims) for o in offs]))
    return stacks


def _kernel(*refs, cap: int, rc2: float, shift_energy: bool, spec=None,
            with_energy: bool = True, usig: float = None,
            ueps: float = None, table_fns=(None, None)):
    has_bonds = spec is not None and spec.has_bonds
    has_table = table_fns != (None, None)
    k_eps, k_sig = table_fns
    refs = list(refs)
    xi, yi, zi = refs[:3]
    del refs[:3]
    se = None if ueps is not None else refs.pop(0)
    hs = None if usig is not None else refs.pop(0)
    ty = refs.pop(0) if has_table else None
    if has_bonds:
        nbp = spec.bond_slots
        bps = refs[:nbp]
        del refs[:nbp]
    else:
        bps = None
    xj, yj, zj = refs[:3]
    del refs[:3]
    sej = None if ueps is not None else refs.pop(0)
    hsj = None if usig is not None else refs.pop(0)
    tyj = refs.pop(0) if has_table else None
    pidj = refs.pop(0) if has_bonds else None
    fx, fy, fz, fjx, fjy, fjz, ew = refs
    ct = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        fx[...] = jnp.zeros_like(fx)
        fy[...] = jnp.zeros_like(fy)
        fz[...] = jnp.zeros_like(fz)

    @pl.when((o == 0) & (ct == 0))
    def _init_ew():
        ew[...] = jnp.zeros_like(ew)

    x_i = xi[...]
    y_i = yi[...]
    z_i = zi[...]
    se_i = se[...] if se is not None else None
    hs_i = hs[...] if hs is not None else None
    ty_i = ty[...] if ty is not None else None
    if has_bonds:
        bp_i = [b[...] for b in bps]
    z = jnp.zeros_like(x_i)
    # non-self offsets: each unordered pair once (weight 1); self: both
    # orders enumerated (weight ½), and no j-side force (i gets both)
    is_self = o == 0
    we = jnp.where(is_self, 0.5, 1.0)
    wj = jnp.where(is_self, 0.0, 1.0)

    def pair_row(xr, yr, zr, ser, hsr, pidr, tyr=None):
        dx = x_i - xr
        dy = y_i - yr
        dz = z_i - zr
        r2 = dx * dx + dy * dy + dz * dz
        if ueps is not None:
            # vacancy via the static coordinate sentinel: the integrators
            # PIN vacant slots at the exact VACANT_X value every step
            # (integrate/packed._pin_vacant), so the r² tests alone cull
            # every vacant pair — sentinel–sentinel pairs have r²==0
            # exactly (the >1e-12 self-pair test), image-shifted ones
            # r²≥L²≫rc², vacant–real ~1e14.  Dropping the two explicit
            # position compares removes ~10% of the VPU ops in the hot
            # pair chain (measured r3).
            eps = ueps
            inside = (r2 < rc2) & (r2 > 1e-12)
        else:
            eps = se_i * ser
            # eps > 0 gate: vacant slots (se=0) drift under Langevin noise
            # and can pass within r²~1e-8 of each other; with a nonzero
            # uniform sig the s12 power overflows to inf and 0·inf = NaN.
            # Masking BEFORE the power chain keeps excluded pairs zero.
            inside = (r2 < rc2) & (r2 > 1e-12) & (eps > 0.0)
        if k_eps is not None:
            eps = eps * k_eps(ty_i, tyr)
        inv = jnp.where(inside, 1.0, 0.0) / jnp.where(inside, r2, 1.0)
        if usig is not None:
            sig = usig
            s2 = (usig * usig) * inv
        else:
            sig = hs_i + hsr
            if k_sig is not None:
                sig = sig * k_sig(ty_i, tyr)
            s2 = sig * sig * inv
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        if with_energy:
            e = 4.0 * eps * (s12 - s6)
            if shift_energy:
                if usig is not None:
                    sc6 = float((usig * usig / rc2) ** 3)
                else:
                    sc2 = sig * sig * (1.0 / rc2)
                    sc6 = sc2 * sc2 * sc2
                e = e - jnp.where(inside, 4.0 * eps * (sc6 * sc6 - sc6), 0.0)
        else:
            e = None
        coef = 4.0 * eps * (12.0 * s12 - 6.0 * s6) * inv
        if pidr is not None:
            # not gated on the pair r_cut: a stretched bond keeps FENE+WCA
            match = bp_i[0] == pidr + 1.0
            for bpk in bp_i[1:]:
                match = match | (bpk == pidr + 1.0)
            bonded = match & (r2 > 1e-12)
            r2b = jnp.where(bonded, r2, 1.0)
            e_b, coef_b = _fene_wca_pair(r2b, eps, sig, spec)
            if with_energy:
                e = jnp.where(bonded, e_b, e)
            coef = jnp.where(bonded, coef_b, coef)
        return coef, dx, dy, dz, e, r2

    CH = 40 if cap % 40 == 0 else 8
    assert cap % CH == 0

    def chunk_body(jc, carry):
        afx, afy, afz, ae, awx, awy, awz = carry
        j0 = pl.multiple_of(jc * CH, CH)
        xs = xj[0, pl.ds(j0, CH), :]
        ys = yj[0, pl.ds(j0, CH), :]
        zs = zj[0, pl.ds(j0, CH), :]
        ss = sej[0, pl.ds(j0, CH), :] if sej is not None else None
        hss = hsj[0, pl.ds(j0, CH), :] if hsj is not None else None
        tys = tyj[0, pl.ds(j0, CH), :] if tyj is not None else None
        if pidj is not None:
            ps = pidj[0, pl.ds(j0, CH), :]
        for k in range(CH):
            coef, dx, dy, dz, e, r2 = pair_row(
                xs[k, :][None, :], ys[k, :][None, :], zs[k, :][None, :],
                ss[k, :][None, :] if ss is not None else None,
                hss[k, :][None, :] if hss is not None else None,
                ps[k, :][None, :] if pidj is not None else None,
                tys[k, :][None, :] if tys is not None else None)
            tx = coef * dx
            ty = coef * dy
            tz = coef * dz
            afx = afx + tx
            afy = afy + ty
            afz = afz + tz
            # j-row reaction forces: single-row stores into the rolled-frame
            # block (measured faster than one-hot carry accumulation)
            fjx[0, j0 + k, :] = -wj * jnp.sum(tx, axis=0)
            fjy[0, j0 + k, :] = -wj * jnp.sum(ty, axis=0)
            fjz[0, j0 + k, :] = -wj * jnp.sum(tz, axis=0)
            if with_energy:
                ae = ae + jnp.sum(e)
                # per-axis (diagonal) virial components
                awx = awx + jnp.sum(tx * dx)
                awy = awy + jnp.sum(ty * dy)
                awz = awz + jnp.sum(tz * dz)
        return afx, afy, afz, ae, awx, awy, awz

    afx, afy, afz, ae, awx, awy, awz = jax.lax.fori_loop(
        0, cap // CH, chunk_body,
        (z, z, z, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
         jnp.float32(0.0)))

    fx[...] += afx
    fy[...] += afy
    fz[...] += afz
    if with_energy:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        ew[...] += (jnp.where(lane == 0, we * ae, 0.0)
                    + jnp.where(lane == 1, we * awx, 0.0)
                    + jnp.where(lane == 2, we * awy, 0.0)
                    + jnp.where(lane == 3, we * awz, 0.0))


def packed_lj_force_pallas2(state: PackedState, spec: PackedSpec,
                            with_energy: bool = True) -> PackedState:
    """Newton-halved drop-in for packed_lj_force_pallas (TPU only)."""
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    cap8 = ((cap + 7) // 8) * 8
    # live-temp count scales with the j-loop unroll: CH=cap (full unroll,
    # chosen in _kernel when cap8 % 40 == 0) keeps ~2x the slab rows alive
    # (measured 22.3M scoped vmem at cap8=40, CT=768 → ~190 rows)
    live_rows = 200 if cap8 % 40 == 0 else 90
    ct_budget = max(128, (11 * 2**20) // (live_rows * 4 * cap8) // 128 * 128)
    # pick the tile count minimizing total padding (measured: 12% Cpad
    # waste costs more than the extra grid steps of smaller tiles); ties
    # prefer larger tiles (fewer programs)
    best = None
    for cand in range(1, -(-C // 128) + 1):
        ct = ((-(-C // cand) + 127) // 128) * 128
        if ct > ct_budget:
            continue
        cpad = cand * ct
        if best is None or cpad < best[2]:
            best = (cand, ct, cpad)
    n_ct, CT, Cpad = best

    def pad(a, cap_axis, c_axis, fill=0.0):
        pads = [(0, 0)] * a.ndim
        pads[cap_axis] = (0, cap8 - cap)
        pads[c_axis] = (0, Cpad - C)
        return jnp.pad(a, pads, constant_values=fill)

    stacks = _half_stacks(state, spec)
    # pad the pidj stack with the vacant sentinel n_real (pid+1 = n_real+1
    # never matches a bond-partner attr) — see packed_pallas.py.  In
    # uniform-eps mode the COORDINATE pads must be the vacancy sentinel
    # too: zero-padded rows would sit at the origin inside the box.
    fills = [0.0] * len(stacks)
    if spec.uniform_eps is not None:
        from .packed import VACANT_X
        fills[0] = fills[1] = fills[2] = VACANT_X
    if spec.has_bonds:
        fills[-1] = float(spec.n_real)
    stacks = [pad(s, 1, 2, f) for s, f in zip(stacks, fills)]
    cfill = 0.0
    if spec.uniform_eps is not None:
        from .packed import VACANT_X
        cfill = VACANT_X
    xi = pad(state.r[0].reshape(cap, C), 0, 1, cfill)
    yi = pad(state.r[1].reshape(cap, C), 0, 1, cfill)
    zi = pad(state.r[2].reshape(cap, C), 0, 1, cfill)
    const_in = [xi, yi, zi]
    if spec.uniform_eps is None:
        const_in.append(pad(state.attrs["se"].reshape(cap, C), 0, 1))
    if spec.uniform_sigma is None:
        const_in.append(pad(state.attrs["hs"].reshape(cap, C), 0, 1))
    if spec.has_pair_table:
        const_in.append(
            pad(state.typ.astype(jnp.float32).reshape(cap, C), 0, 1))
    if spec.has_bonds:
        const_in += [pad(state.attrs[f"bp{k}"].reshape(cap, C), 0, 1)
                     for k in range(spec.bond_slots)]

    const_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                              memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                             memory_space=pltpu.VMEM)
    fj_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                           memory_space=pltpu.VMEM)
    from .packed import pair_scales_for
    kern = functools.partial(
        _kernel, cap=cap8, rc2=float(spec.r_cut) ** 2,
        shift_energy=spec.shift_energy, spec=spec if spec.has_bonds else None,
        with_energy=with_energy, usig=spec.uniform_sigma,
        ueps=spec.uniform_eps,
        table_fns=pair_scales_for(spec))
    fx, fy, fz, fjx, fjy, fjz, ew = pl.pallas_call(
        kern,
        grid=(n_ct, 14),
        in_specs=[const_spec] * len(const_in) + [slab_spec] * len(stacks),
        out_specs=[
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            fj_spec, fj_spec, fj_spec,
            pl.BlockSpec((1, 128), lambda ct, o: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((14, cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((14, cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((14, cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
    )(*const_in, *stacks)

    # roll the j-frame reaction forces back to their true cells and sum
    # (inverse offset −o, in the flat layout — see _roll_cells_flat)
    offs = _half_offsets()
    dims = (cx, cy, cz)
    comps = []
    for fj, fi in ((fjx, fx), (fjy, fy), (fjz, fz)):
        tot = fi[:cap, :C]
        for oi, o in enumerate(offs[1:], start=1):
            tot = tot + _roll_cells_flat(
                fj[oi, :cap, :C], (-o[0], -o[1], -o[2]), dims)
        comps.append(tot.reshape(-1))
    if with_energy:
        return state.replace(
            f=jnp.stack(comps),
            potential_energy=ew[0, 0],
            virial=ew[0, 1:4],
        )
    # energy skipped for inner MD steps — refreshed at stride boundaries
    return state.replace(f=jnp.stack(comps))
