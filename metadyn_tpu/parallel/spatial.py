"""Spatial domain decomposition: packed cell grid sharded over chips.

Reference parity: HOOMD's MPI spatial decomposition — ``Communicator``
sub-boxes with ghost-particle layers exchanged every step (recalled,
SURVEY.md §2b Communicator row, §5 "scaling-N analog", §7 P8).  This is
the second scaling axis next to data-parallel walkers: it shards the
PARTICLES (via their cells) so N can grow past one chip's HBM/FLOPs.

TPU-native re-design: the packed slot layout (cap, cx, cy, cz) is sharded
along the x cell axis over a ``"space"`` mesh axis.  Each device owns
cx/ndev contiguous x-planes; the 27-offset roll force needs exactly ONE
neighbor plane on each side, fetched with ``jax.lax.ppermute`` over the
ring (the ghost layer — ICI traffic is 2 planes of 5 slot arrays per
force call).  Positions crossing the periodic seam are shifted by ±Lx in
transit so the pair math stays absolute-coordinate.  Energy/virial are
``psum``-reduced with halo i-cells masked out of the sums (each unordered
pair is counted exactly twice globally, as in the single-device kernel).

Scope (prototype — the differential force/energy parity vs the
single-device kernel is exercised on the multi-device CPU mesh):
pair forces, energy, virial.  Slot migration across shard boundaries
(the moving-ghost protocol) still runs through a global repack between
sharded force blocks; a fully sharded incremental repack is the follow-up.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.box import Box
from ..ops.packed import PackedSpec, PackedState, packed_lj_force


def _shard_map(fn, mesh, in_specs, out_specs):
    if hasattr(jax, "shard_map"):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as sm
    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _halo_exchange_x(plane_lo, plane_hi, axis: str, n_dev: int):
    """Ring ppermute: send my low/high boundary x-planes to my left/right
    neighbors; returns (left_halo, right_halo) received from them."""
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]   # to the right
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]   # to the left
    # my left halo = left neighbor's HIGH plane (arrives via fwd ring)
    left_halo = jax.lax.ppermute(plane_hi, axis, fwd)
    # my right halo = right neighbor's LOW plane (arrives via bwd ring)
    right_halo = jax.lax.ppermute(plane_lo, axis, bwd)
    return left_halo, right_halo


def make_sharded_lj_force(spec: PackedSpec, mesh: Mesh, axis: str = "space"):
    """Build ``force(state) -> state`` with the cell grid sharded along x.

    ``state`` holds GLOBAL (cap, C)-flat slot arrays; under ``jit`` +
    ``shard_map`` each device touches only its x-slab plus two ghost
    planes.  Requires ``cx % n_dev == 0`` and no bonds (prototype).
    """
    assert not spec.has_bonds, "sharded force prototype: no bonds yet"
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    n_dev = mesh.shape[axis]
    assert cx % n_dev == 0, (
        f"x cell count {cx} must divide over {n_dev} devices")
    cx_l = cx // n_dev
    assert cx_l >= 1
    plane = cy * cz                      # cells per x-plane
    C_l = cx_l * plane

    # extended local spec: two ghost x-planes; same capacity
    spec_ext = PackedSpec(
        cells_per_dim=(cx_l + 2, cy, cz), cap=cap, n_real=spec.n_real,
        r_cut=spec.r_cut, skin=spec.skin, shift_energy=spec.shift_energy,
        uniform_sigma=spec.uniform_sigma)
    # interior mask over extended cells: ghost planes excluded from the
    # energy/virial sums (each pair then counted exactly twice globally)
    interior = np.ones((cx_l + 2, plane), np.float32)
    interior[0] = 0.0
    interior[-1] = 0.0
    interior = jnp.asarray(interior.reshape(-1))

    def local_force(r, se, hs, box_L):
        """Per-device body: r (3, cap, C_l), se/hs (cap, C_l)."""
        idx = jax.lax.axis_index(axis)
        Lx = box_L[0]

        def extend(a, is_x):
            a4 = a.reshape(cap, cx_l, plane)
            lo, hi = a4[:, 0], a4[:, -1]
            lh, rh = _halo_exchange_x(lo, hi, axis, n_dev)
            if is_x:
                # periodic seam: coordinates shift by ∓Lx crossing it
                lh = lh - jnp.where(idx == 0, Lx, 0.0)
                rh = rh + jnp.where(idx == n_dev - 1, Lx, 0.0)
            return jnp.concatenate(
                [lh[:, None], a4, rh[:, None]], axis=1).reshape(cap, -1)

        r_ext = jnp.stack([extend(r[d], d == 0) for d in range(3)])
        se_ext = extend(se, False)
        hs_ext = extend(hs, False)
        npad_ext = cap * (cx_l + 2) * plane
        st_ext = PackedState(
            r=r_ext.reshape(3, -1), v=jnp.zeros((3, npad_ext)),
            f=jnp.zeros((3, npad_ext)),
            image=jnp.zeros((3, npad_ext), jnp.int32),
            ref_r=r_ext.reshape(3, -1),
            pid=jnp.zeros(npad_ext, jnp.int32),
            typ=jnp.zeros(npad_ext, jnp.int32),
            slot_of=jnp.zeros(1, jnp.int32),
            attrs={"se": se_ext.reshape(-1), "hs": hs_ext.reshape(-1)},
            box=Box(L=box_L),
            potential_energy=jnp.float32(0.0), virial=jnp.float32(0.0))
        out = packed_lj_force(st_ext, spec_ext, cell_mask=interior)
        # keep interior planes only; reduce the scalars over the ring
        f_loc = out.f.reshape(3, cap, cx_l + 2, plane)[:, :, 1:-1]
        e = jax.lax.psum(out.potential_energy, axis)
        w = jax.lax.psum(out.virial, axis)
        return f_loc.reshape(3, cap, C_l), e, w

    # the flat slot axis is cap-major/C-minor, so sharding must apply to
    # the (cap, C) VIEW along C (contiguous chunks of C are x-slabs)
    sharded = _shard_map(
        local_force, mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(None, axis), P()),
        out_specs=(P(None, None, axis), P(), P()),
    )

    def force(state: PackedState) -> PackedState:
        f, e, w = sharded(state.r.reshape(3, cap, C),
                          state.attrs["se"].reshape(cap, C),
                          state.attrs["hs"].reshape(cap, C),
                          state.box.L)
        return state.replace(f=f.reshape(3, cap * C),
                             potential_energy=e, virial=w)

    return force
