"""Pallas order-CV sweep kernels: Q_l / coordination values and forces.

Reference parity: the ``SteinhardtQl`` CUDA kernels (recalled, SURVEY.md
§2a Steinhardt row, §2c item 4) — per-bond Y_lm evaluation and the dY_lm
chain-rule force, evaluated over the cell structure.

Why a kernel: the XLA roll sweep (cv/packed_order.py) carries ~20-30 live
(cap, cap, C)-shaped temporaries through the Y_lm math, which exceeds
XLA's fusion budget and runs at ~60% of the VPU roofline (measured round
3: force sweep 9.3 ms at Config-3 scale vs ~5.7 ms of pure FLOPs).  The
Pallas twin walks the same Newton-halved 14-offset structure tile by tile
with every temporary in VMEM/registers.

Structure mirrors ops/packed_pallas2.py: grid (C-tiles × 14 offsets), the
i-block (cap8, CT) resident across offsets, the j side looped in 8-row
chunks from per-offset rolled slabs; j-side reaction forces accumulate in
the rolled frame and are rolled back in a cheap XLA post-pass.

CV math is NOT duplicated here: the kernels call the CVs' flat-scalar
protocol (``pair_value_terms_flat`` / ``pair_grad_terms`` — the same
functions the XLA sweep traces), so the oracle tests pin one shared
implementation.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import (PackedSpec, PackedState, VACANT_THR, VACANT_X,
                     shift_rows_cart)
from .packed_pallas2 import _half_offsets, _roll_cells_flat


def _order_stacks(state: PackedState, spec: PackedSpec):
    """(14, cap, C) rolled+shifted coordinate stacks (+ validity stack and
    plane unless the spec's uniform-eps coordinate sentinel encodes
    vacancy).  Returns (stacks, vi) with vi None in sentinel mode."""
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
    vi = None
    if spec.uniform_eps is None:
        valid = (state.pid < spec.n_real).astype(jnp.float32).reshape(cap, C)
        stacks.append(jnp.stack(
            [_roll_cells_flat(valid, o, dims) for o in offs]))
        vi = valid
    return stacks, vi


def _tile(spec: PackedSpec, live_rows: int):
    """(cap8, n_ct, CT, Cpad): C-tiling with minimal padding under the
    VMEM live-row budget (same heuristic as packed_lj_force_pallas2)."""
    cap, C = spec.cap, spec.n_cells
    cap8 = ((cap + 7) // 8) * 8
    ct_budget = max(128, (11 * 2**20) // (live_rows * 4 * cap8) // 128 * 128)
    best = None
    for cand in range(1, -(-C // 128) + 1):
        ct = ((-(-C // cand) + 127) // 128) * 128
        if ct > ct_budget:
            continue
        cpad = cand * ct
        if best is None or cpad < best[2]:
            best = (cand, ct, cpad)
    n_ct, CT, Cpad = best
    return cap8, n_ct, CT, Cpad


def _pair_geom(x_i, y_i, z_i, v_i, xr, yr, zr, vr, sentinel: bool):
    dx = x_i - xr
    dy = y_i - yr
    dz = z_i - zr
    r2 = dx * dx + dy * dy + dz * dz
    if sentinel:
        w = ((x_i < VACANT_THR) & (xr < VACANT_THR)
             & (r2 > 1e-12)).astype(jnp.float32)
    else:
        w = v_i * vr * (r2 > 1e-12)
    return dx, dy, dz, r2, w


def _values_kernel(*refs, cap: int, cvs, n_terms: int, sentinel: bool,
                   masked: bool = False):
    refs = list(refs)
    xi, yi, zi = refs[:3]
    del refs[:3]
    vi = None if sentinel else refs.pop(0)
    # per-CELL i-side weight (spatial DD: interior=1, ghost=0 — each
    # global pair then counted on exactly ONE device, because the
    # half-offset enumeration assigns a boundary pair the same i cell on
    # both sides of the exchange)
    im = refs.pop(0) if masked else None
    xj, yj, zj = refs[:3]
    del refs[:3]
    vj = None if sentinel else refs.pop(0)
    (out,) = refs
    ct = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when((o == 0) & (ct == 0))
    def _init():
        out[...] = jnp.zeros_like(out)

    x_i = xi[...]
    y_i = yi[...]
    z_i = zi[...]
    v_i = vi[...] if vi is not None else None
    # Newton halving: cross-offset pairs enumerated once, weight 2; the
    # self offset enumerates both orders, weight 1 (the half-sweep
    # conventions of cv/packed_order._offset_pair_sweep)
    wt = jnp.where(o == 0, 1.0, 2.0)
    if im is not None:
        wt = wt * im[0:1, :]

    CH = 8
    assert cap % CH == 0

    def chunk_body(jc, carry):
        j0 = pl.multiple_of(jc * CH, CH)
        xs = xj[0, pl.ds(j0, CH), :]
        ys = yj[0, pl.ds(j0, CH), :]
        zs = zj[0, pl.ds(j0, CH), :]
        vs = vj[0, pl.ds(j0, CH), :] if vj is not None else None
        for k in range(CH):
            dx, dy, dz, r2, w = _pair_geom(
                x_i, y_i, z_i, v_i,
                xs[k, :][None, :], ys[k, :][None, :], zs[k, :][None, :],
                vs[k, :][None, :] if vs is not None else None, sentinel)
            w = wt * w
            flat = []
            for cv in cvs:
                flat.extend(cv.pair_value_terms_flat(dx, dy, dz, r2, w))
            carry = tuple(c + f for c, f in zip(carry, flat))
        return carry

    acc = jax.lax.fori_loop(
        0, cap // CH, chunk_body, (jnp.float32(0.0),) * n_terms)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    add = jnp.zeros_like(out)
    for t in range(n_terms):
        add = add + jnp.where(lane == t, acc[t], 0.0)
    out[...] += add


def _force_kernel(*refs, cap: int, cvs, aux_sizes, sentinel: bool):
    refs = list(refs)
    xi, yi, zi = refs[:3]
    del refs[:3]
    vi = None if sentinel else refs.pop(0)
    auxl = refs.pop(0)
    xj, yj, zj = refs[:3]
    del refs[:3]
    vj = None if sentinel else refs.pop(0)
    fx, fy, fz, fjx, fjy, fjz = refs
    ct = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        fx[...] = jnp.zeros_like(fx)
        fy[...] = jnp.zeros_like(fy)
        fz[...] = jnp.zeros_like(fz)

    # per-CV aux scalars from the lane-packed (1, 128) input
    auxs = []
    idx = 0
    for cv, na in zip(cvs, aux_sizes):
        auxs.append(cv.aux_from_flat([auxl[0, idx + i] for i in range(na)]))
        idx += na

    x_i = xi[...]
    y_i = yi[...]
    z_i = zi[...]
    v_i = vi[...] if vi is not None else None
    z = jnp.zeros_like(x_i)
    # self offset: both orders hit the i side (aux folds the 2×), no
    # j-side reaction; cross offsets: i side + rolled-frame reaction
    wj = jnp.where(o == 0, 0.0, 1.0)

    CH = 8
    assert cap % CH == 0

    def chunk_body(jc, carry):
        agx, agy, agz = carry
        j0 = pl.multiple_of(jc * CH, CH)
        xs = xj[0, pl.ds(j0, CH), :]
        ys = yj[0, pl.ds(j0, CH), :]
        zs = zj[0, pl.ds(j0, CH), :]
        vs = vj[0, pl.ds(j0, CH), :] if vj is not None else None
        for k in range(CH):
            dx, dy, dz, r2, w = _pair_geom(
                x_i, y_i, z_i, v_i,
                xs[k, :][None, :], ys[k, :][None, :], zs[k, :][None, :],
                vs[k, :][None, :] if vs is not None else None, sentinel)
            gx = gy = gz = jnp.float32(0.0)
            for cv, aux in zip(cvs, auxs):
                ax, ay, az = cv.pair_grad_terms(dx, dy, dz, r2, aux)
                gx, gy, gz = gx + ax, gy + ay, gz + az
            tx = w * gx
            ty = w * gy
            tz = w * gz
            agx = agx + tx
            agy = agy + ty
            agz = agz + tz
            fjx[0, j0 + k, :] = -wj * jnp.sum(tx, axis=0)
            fjy[0, j0 + k, :] = -wj * jnp.sum(ty, axis=0)
            fjz[0, j0 + k, :] = -wj * jnp.sum(tz, axis=0)
        return agx, agy, agz

    agx, agy, agz = jax.lax.fori_loop(0, cap // CH, chunk_body, (z, z, z))
    fx[...] += agx
    fy[...] += agy
    fz[...] += agz


def _padded_inputs(state, spec, stacks, vi, cap8, Cpad):
    cap, C = spec.cap, spec.n_cells
    sentinel = spec.uniform_eps is not None

    def pad(a, cap_axis, c_axis, fill=0.0):
        pads = [(0, 0)] * a.ndim
        pads[cap_axis] = (0, cap8 - cap)
        pads[c_axis] = (0, Cpad - C)
        return jnp.pad(a, pads, constant_values=fill)

    cfill = VACANT_X if sentinel else 0.0
    fills = [cfill, cfill, cfill] + ([] if sentinel else [0.0])
    slabs = [pad(s, 1, 2, f) for s, f in zip(stacks, fills)]
    const = [pad(state.r[d].reshape(cap, C), 0, 1, cfill) for d in range(3)]
    if not sentinel:
        const.append(pad(vi, 0, 1, 0.0))
    return const, slabs


def order_values_pallas(state: PackedState, spec: PackedSpec, cvs,
                        stacks=None, cell_mask=None):
    """Newton-halved order-CV value sweep on TPU.  Returns (terms, stacks)
    with ``terms`` structured exactly like the XLA sweep's and ``stacks``
    reusable by :func:`order_force_pallas` within the same step.

    ``cell_mask`` (C,) weights every pair by its i-CELL — the spatial-DD
    hook: interior=1/ghost=0 on a halo-extended local grid counts each
    global pair on exactly one device (see _values_kernel)."""
    sentinel = spec.uniform_eps is not None
    if stacks is None:
        stacks = _order_stacks(state, spec)
    raw, vi = stacks
    n_terms = sum(cv.n_value_terms for cv in cvs)
    assert n_terms <= 128, "too many CV terms for one lane vector"
    cap8, n_ct, CT, Cpad = _tile(spec, live_rows=140)
    const, slabs = _padded_inputs(state, spec, raw, vi, cap8, Cpad)
    if cell_mask is not None:
        mask8 = jnp.broadcast_to(
            jnp.pad(jnp.asarray(cell_mask, jnp.float32),
                    (0, Cpad - spec.n_cells))[None, :], (8, Cpad))
        const = const + [mask8]

    const_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                              memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((8, CT), lambda ct, o: (0, ct),
                             memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                             memory_space=pltpu.VMEM)
    kern = functools.partial(_values_kernel, cap=cap8, cvs=tuple(cvs),
                             n_terms=n_terms, sentinel=sentinel,
                             masked=cell_mask is not None)
    [out] = pl.pallas_call(
        kern,
        grid=(n_ct, 14),
        in_specs=([const_spec] * (len(const) - (1 if cell_mask is not None
                                                else 0))
                  + ([mask_spec] if cell_mask is not None else [])
                  + [slab_spec] * len(slabs)),
        out_specs=[pl.BlockSpec((1, 128), lambda ct, o: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32)],
    )(*const, *slabs)
    flat = [out[0, t] for t in range(n_terms)]
    terms = []
    idx = 0
    for cv in cvs:
        terms.append(cv.terms_from_flat(tuple(flat[idx:idx + cv.n_value_terms])))
        idx += cv.n_value_terms
    return tuple(terms), stacks


def order_force_pallas(state: PackedState, spec: PackedSpec, cvs, auxs,
                       stacks=None):
    """Newton-halved order-CV bias-force sweep on TPU: (3, Npad) with the
    per-CV ``grad_aux`` outputs contracted in-kernel (same math as the
    XLA `_offset_force_sweep`)."""
    sentinel = spec.uniform_eps is not None
    if stacks is None:
        stacks = _order_stacks(state, spec)
    raw, vi = stacks
    aux_sizes = [cv.aux_size for cv in cvs]
    flat_aux = []
    for cv, aux in zip(cvs, auxs):
        flat_aux.extend(cv.aux_flat(aux))
    n_aux = len(flat_aux)
    assert n_aux <= 128
    aux_lanes = jnp.concatenate(
        [jnp.stack([jnp.asarray(a, jnp.float32) for a in flat_aux]),
         jnp.zeros(128 - n_aux, jnp.float32)])[None, :]
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    cap8, n_ct, CT, Cpad = _tile(spec, live_rows=200)
    const, slabs = _padded_inputs(state, spec, raw, vi, cap8, Cpad)

    const_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                              memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                             memory_space=pltpu.VMEM)
    fi_spec = pl.BlockSpec((cap8, CT), lambda ct, o: (0, ct),
                           memory_space=pltpu.VMEM)
    fj_spec = pl.BlockSpec((1, cap8, CT), lambda ct, o: (o, 0, ct),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_force_kernel, cap=cap8, cvs=tuple(cvs),
                             aux_sizes=aux_sizes, sentinel=sentinel)
    fx, fy, fz, fjx, fjy, fjz = pl.pallas_call(
        kern,
        grid=(n_ct, 14),
        in_specs=([const_spec] * len(const)
                  + [pl.BlockSpec((1, 128), lambda ct, o: (0, 0),
                                  memory_space=pltpu.VMEM)]
                  + [slab_spec] * len(slabs)),
        out_specs=[fi_spec] * 3 + [fj_spec] * 3,
        out_shape=([jax.ShapeDtypeStruct((cap8, Cpad), jnp.float32)] * 3
                   + [jax.ShapeDtypeStruct((14, cap8, Cpad), jnp.float32)] * 3),
    )(*const, aux_lanes, *slabs)

    # roll j-frame reaction forces back with the inverse offset, staying in
    # the flat (cap, C) lane layout (see packed_pallas2._roll_cells_flat)
    offs = _half_offsets()
    dims = (cx, cy, cz)
    comps = []
    for fj, fi in ((fjx, fx), (fjy, fy), (fjz, fz)):
        tot = fi[:cap, :C]
        for oi, o in enumerate(offs[1:], start=1):
            tot = tot + _roll_cells_flat(
                fj[oi, :cap, :C], (-o[0], -o[1], -o[2]), dims)
        comps.append(tot.reshape(-1))
    return jnp.stack(comps)
