"""Pallas TPU kernel for the packed LJ pair force (the hot op).

This is the Pallas twin of ``ops.packed.packed_lj_force`` — same 27-offset
roll method, but with the per-offset pair tensors kept entirely in
VMEM/registers instead of round-tripping (cap, cap, C) intermediates
through HBM (measured: the XLA version is traffic-bound at ~6.5 ms/step at
64k; this kernel is VPU-bound).

Structure:
- XLA pre-pass builds the 27 rolled + periodic-shifted partner stacks
  (27, cap, C) per coordinate (cheap contiguous copies; overlaps with the
  kernel via XLA async scheduling).
- Pallas grid = (27, C-tiles): program (o, ct) processes one cell tile of
  one offset; Pallas double-buffers the slab DMAs across grid steps.
- Partner rows are consumed in 8-row slabs (sublane-aligned dynamic slice —
  Mosaic requires multiples of 8) with a static 8-row unroll inside, so no
  per-row dynamic relayout happens in the inner loop.
- Force accumulators are output blocks revisited across the offset axis
  (matmul-accumulator pattern), initialized at o==0.
- Energy/virial accumulate into an (1, 128) f32 lane-masked row.

Reference parity: HOOMD ``PotentialPairLJGPU`` + ``CellListGPU`` CUDA
kernels (SURVEY.md §2c items 7–8).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import (PackedSpec, PackedState, _roll_offsets, _fene_wca_pair,
                     shift_rows_cart)


def _rolled_stacks(state: PackedState, spec: PackedSpec):
    """(27, cap, C) partner arrays: coordinates shifted to the near frame."""
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    offs = _roll_offsets(spec)
    # (27, 3, C) lattice wrap counts → Cartesian shifts (tilt-aware)
    shift = shift_rows_cart(np.stack([u for (_, u) in offs]), state.box)
    view = lambda a: a.reshape(cap, cx, cy, cz)
    stacks = []
    for d in range(3):
        x4 = view(state.r[d].reshape(cap, C))
        rolled = jnp.stack([
            jnp.roll(x4, shift=(-o[0], -o[1], -o[2]), axis=(1, 2, 3)).reshape(cap, C)
            for (o, _) in offs
        ])                                                    # (27, cap, C)
        stacks.append(rolled + shift[:, d][:, None, :])
    extra = [state.attrs["se"], state.attrs["hs"]]
    if spec.has_bonds:
        extra.append(state.pid.astype(jnp.float32))
    for arr in extra:
        a4 = view(arr.reshape(cap, C))
        stacks.append(jnp.stack([
            jnp.roll(a4, shift=(-o[0], -o[1], -o[2]), axis=(1, 2, 3)).reshape(cap, C)
            for (o, _) in offs
        ]))
    return stacks  # xj, yj, zj, sej, hsj[, pidj]


def _kernel(*refs, cap: int, rc2: float, shift_energy: bool, spec=None):
    refs = list(refs)
    xi, yi, zi, se, hs = refs[:5]
    del refs[:5]
    if spec is not None and spec.has_bonds:
        nbp = spec.bond_slots
        bps = refs[:nbp]
        del refs[:nbp]
        xj, yj, zj, sej, hsj, pidj = refs[:6]
        del refs[:6]
    else:
        bps = pidj = None
        xj, yj, zj, sej, hsj = refs[:5]
        del refs[:5]
    fx, fy, fz, ew = refs
    ct = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        # per-C-tile force blocks: init on first offset visit of each tile
        fx[...] = jnp.zeros_like(fx)
        fy[...] = jnp.zeros_like(fy)
        fz[...] = jnp.zeros_like(fz)

    @pl.when((o == 0) & (ct == 0))
    def _init_ew():
        # the ew row is ONE block shared by all tiles — init exactly once
        ew[...] = jnp.zeros_like(ew)

    x_i = xi[...]
    y_i = yi[...]
    z_i = zi[...]
    se_i = se[...]
    hs_i = hs[...]
    if bps is not None:
        bp_i = [b[...] for b in bps]
    z = jnp.zeros_like(x_i)

    def pair_row(xr, yr, zr, ser, hsr, pidr=None):
        """One partner row (1, CT) against all i rows (cap, CT)."""
        dx = x_i - xr
        dy = y_i - yr
        dz = z_i - zr
        r2 = dx * dx + dy * dy + dz * dz
        eps = se_i * ser
        sig = hs_i + hsr
        inside = (r2 < rc2) & (r2 > 1e-12)
        inv = jnp.where(inside, 1.0, 0.0) / jnp.where(inside, r2, 1.0)
        s2 = sig * sig * inv
        s6 = s2 * s2 * s2
        s12 = s6 * s6
        e = 4.0 * eps * (s12 - s6)
        if shift_energy:
            sc2 = sig * sig * (1.0 / rc2)
            sc6 = sc2 * sc2 * sc2
            e = e - jnp.where(inside, 4.0 * eps * (sc6 * sc6 - sc6), 0.0)
        coef = 4.0 * eps * (12.0 * s12 - 6.0 * s6) * inv
        if pidr is not None:
            # bp attrs are partner_pid+1 (0 = none) — vacant-safe.  Not
            # gated on the pair r_cut: a stretched bond keeps FENE+WCA
            # (only the plain LJ term is cutoff-limited).
            match = bp_i[0] == pidr + 1.0
            for bpk in bp_i[1:]:
                match = match | (bpk == pidr + 1.0)
            bonded = match & (r2 > 1e-12)
            r2b = jnp.where(bonded, r2, 1.0)
            e_b, coef_b = _fene_wca_pair(r2b, eps, sig, spec)
            e = jnp.where(bonded, e_b, e)
            coef = jnp.where(bonded, coef_b, coef)
        return coef, dx, dy, dz, e, r2

    # 8-row sublane-aligned slabs; static unroll inside a slab
    CH = 8
    assert cap % CH == 0

    def chunk_body(jc, carry):
        afx, afy, afz, ae, awx, awy, awz = carry
        j0 = pl.multiple_of(jc * CH, CH)
        xs = xj[0, pl.ds(j0, CH), :]
        ys = yj[0, pl.ds(j0, CH), :]
        zs = zj[0, pl.ds(j0, CH), :]
        ss = sej[0, pl.ds(j0, CH), :]
        hss = hsj[0, pl.ds(j0, CH), :]
        if pidj is not None:
            ps = pidj[0, pl.ds(j0, CH), :]
        for k in range(CH):
            coef, dx, dy, dz, e, r2 = pair_row(
                xs[k, :][None, :], ys[k, :][None, :], zs[k, :][None, :],
                ss[k, :][None, :], hss[k, :][None, :],
                ps[k, :][None, :] if pidj is not None else None)
            afx = afx + coef * dx
            afy = afy + coef * dy
            afz = afz + coef * dz
            ae = ae + jnp.sum(e)
            # per-axis (diagonal) virial components
            awx = awx + jnp.sum(coef * dx * dx)
            awy = awy + jnp.sum(coef * dy * dy)
            awz = awz + jnp.sum(coef * dz * dz)
        return afx, afy, afz, ae, awx, awy, awz

    afx, afy, afz, ae, awx, awy, awz = jax.lax.fori_loop(
        0, cap // CH, chunk_body,
        (z, z, z, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
         jnp.float32(0.0)))

    fx[...] += afx
    fy[...] += afy
    fz[...] += afz
    # scalars can't be stored to VMEM — write a lane-masked (1, 128) row
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    ew[...] += (jnp.where(lane == 0, ae, 0.0)
                + jnp.where(lane == 1, awx, 0.0)
                + jnp.where(lane == 2, awy, 0.0)
                + jnp.where(lane == 3, awz, 0.0))


def packed_lj_force_pallas(state: PackedState, spec: PackedSpec) -> PackedState:
    """Drop-in replacement for packed_lj_force (TPU only)."""
    assert not spec.has_pair_table, (
        "per-type-pair tables run on packed_lj_force_pallas2 (the "
        "production kernel) or the XLA roll path; the v1 full-sweep "
        "kernel stays the minimal cross-check")
    cap, C = spec.cap, spec.n_cells
    # pad cap to a multiple of 8 (sublane slabs) and tile C so the unrolled
    # slab temporaries fit the 16 MB scoped-VMEM budget
    cap8 = ((cap + 7) // 8) * 8
    # C-tile size bounded so the unrolled slab temporaries fit the 16 MB
    # scoped-VMEM stack (~90 live (cap8, CT) f32 temps, empirically)
    ct_budget = max(128, (12 * 2**20) // (90 * 4 * cap8) // 128 * 128)
    n_ct = max(1, -(-C // ct_budget))
    CT = ((-(-C // n_ct) + 127) // 128) * 128
    Cpad = n_ct * CT

    def pad(a, cap_axis, c_axis, fill=0.0):
        pads = [(0, 0)] * a.ndim
        pads[cap_axis] = (0, cap8 - cap)
        pads[c_axis] = (0, Cpad - C)
        return jnp.pad(a, pads, constant_values=fill)

    stacks = _rolled_stacks(state, spec)
    # pad the pidj stack with the vacant sentinel n_real: pid+1 = n_real+1
    # can never match a bond-partner attr (bp ∈ {0, 1..n_real}), so padded
    # rows never produce phantom FENE pulls
    fills = [0.0] * len(stacks)
    if spec.has_bonds:
        fills[-1] = float(spec.n_real)
    stacks = [pad(s, 1, 2, f) for s, f in zip(stacks, fills)]
    xi = pad(state.r[0].reshape(cap, C), 0, 1)
    yi = pad(state.r[1].reshape(cap, C), 0, 1)
    zi = pad(state.r[2].reshape(cap, C), 0, 1)
    se = pad(state.attrs["se"].reshape(cap, C), 0, 1)
    hs = pad(state.attrs["hs"].reshape(cap, C), 0, 1)
    const_in = [xi, yi, zi, se, hs]
    if spec.has_bonds:
        # padded bp rows are 0 = "no partner", which never matches
        const_in += [pad(state.attrs[f"bp{k}"].reshape(cap, C), 0, 1)
                     for k in range(spec.bond_slots)]

    # grid order (ct, o): the offset axis is INNERMOST so the revisited
    # force-accumulator blocks are revisited on consecutive grid steps —
    # non-consecutive revisits race the block write-back against the next
    # prefetch (observed: wrong forces whenever n_ct > 2)
    const_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                              memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, cap=cap8, rc2=float(spec.r_cut) ** 2,
        shift_energy=spec.shift_energy, spec=spec if spec.has_bonds else None)
    fx, fy, fz, ew = pl.pallas_call(
        kern,
        grid=(n_ct, 27),
        in_specs=[const_spec] * len(const_in) + [slab_spec] * len(stacks),
        out_specs=[
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda ct, o: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
    )(*const_in, *stacks)
    force = jnp.stack([fx[:cap, :C].reshape(-1),
                       fy[:cap, :C].reshape(-1),
                       fz[:cap, :C].reshape(-1)])
    return state.replace(
        f=force,
        potential_energy=0.5 * ew[0, 0],
        virial=0.5 * ew[0, 1:4],
    )
