"""Order-parameter CVs on the packed state: Steinhardt Q_l and coordination.

Reference parity: ``SteinhardtQl`` (SURVEY.md §2a) evaluated on the packed
hot path, plus a smooth coordination-number CV (the "density" axis of the
Config-3 nucleation pair, BASELINE.json:9 — standard practice for
crystal-nucleation metadynamics).

Both reuse the gather-free 27-offset roll sweep of the pair force (see
ops/packed.py): neighbor bonds are enumerated as (cap_j, cap_i, C)
broadcasts per offset with zero dynamic indexing; forces come from the
shared CV vjp.  Requires r_cut ≤ spec.r_list (stencil coverage).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from ..core.state import System
from ..ops.packed import PackedSpec, PackedState, _roll_offsets
from .steinhardt import _plm_over_sinm_coeffs, _norms, ql_from_sums


def _offset_pair_sweep(state: PackedState, spec: PackedSpec, per_pair):
    """Accumulate Σ_pairs per_pair(dx, dy, dz, r2, w_pair) over the 27-offset
    roll structure.  ``per_pair`` returns a pytree of scalars; w_pair is the
    validity weight (1 for real–real pairs inside r_list)."""
    cap, C = spec.cap, spec.n_cells
    cx, cy, cz = spec.cells_per_dim
    view = lambda a: a.reshape(cap, cx, cy, cz)
    x4 = [view(state.r[d].reshape(cap, C)) for d in range(3)]
    valid4 = view((state.pid < spec.n_real).astype(jnp.float32).reshape(cap, C))
    vi = valid4.reshape(cap, C)[None, :, :]
    xi = [x4[d].reshape(cap, C)[None, :, :] for d in range(3)]
    L = state.box.L
    acc = None
    for (o, ushift) in _roll_offsets(spec):
        roll = lambda a: jnp.roll(a, shift=(-o[0], -o[1], -o[2]), axis=(1, 2, 3))
        shift = jnp.asarray(ushift)
        dxs = []
        r2 = jnp.zeros((cap, cap, C), jnp.float32)
        for d in range(3):
            xj = roll(x4[d]).reshape(cap, C) + shift[d][None, :] * L[d]
            c = xi[d] - xj[:, None, :]
            dxs.append(c)
            r2 = r2 + c * c
        vj = roll(valid4).reshape(cap, C)[:, None, :]
        w = vi * vj * (r2 > 1e-12)
        out = per_pair(dxs[0], dxs[1], dxs[2], r2, w)
        acc = out if acc is None else jax.tree.map(jnp.add, acc, out)
    return acc


@struct.dataclass
class PackedSteinhardtQl:
    """Global Q_l over all pair bonds within r_cut (packed twin of
    cv.steinhardt.SteinhardtQl; bonds counted from both sides)."""

    spec: PackedSpec
    r_cut: float = struct.field(pytree_node=False, default=1.5)
    l: int = struct.field(pytree_node=False, default=6)
    name: str = struct.field(pytree_node=False, default="q6")

    def __post_init__(self):
        assert self.r_cut <= self.spec.r_list + 1e-6, (
            "Q_l r_cut must be within the cell stencil (r_cut + skin)")

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def value(self, state: PackedState, system: System) -> jax.Array:
        coeffs = _plm_over_sinm_coeffs(self.l)
        norms = _norms(self.l)
        rcq2 = self.r_cut ** 2

        def per_pair(dx, dy, dz, r2, w):
            w = w * (r2 < rcq2)
            r2s = jnp.where(r2 > 1e-12, r2, 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            cth = dz * inv_r
            ux, uy = dx * inv_r, dy * inv_r
            pr = jnp.ones_like(cth)
            pi = jnp.zeros_like(cth)
            re, im = [], []
            for m in range(self.l + 1):
                pl_ = jnp.zeros_like(cth)
                for a in coeffs[m][::-1]:
                    pl_ = pl_ * cth + a
                re.append(jnp.sum(w * norms[m] * pl_ * pr))
                im.append(jnp.sum(w * norms[m] * pl_ * pi))
                pr, pi = pr * ux - pi * uy, pr * uy + pi * ux
            return jnp.stack(re), jnp.stack(im), jnp.sum(w)

        re, im, nb = _offset_pair_sweep(state, self.spec, per_pair)
        return ql_from_sums(re, im, nb, self.l)


@struct.dataclass
class PackedCoordination:
    """Smooth mean coordination number (PLUMED COORDINATION switching):

        s = (1/N) Σ_pairs [1 − (r/r0)^6] / [1 − (r/r0)^12]

    — the standard "density/structure" companion CV for nucleation.
    """

    spec: PackedSpec
    r0: float = struct.field(pytree_node=False, default=1.5)
    name: str = struct.field(pytree_node=False, default="coord")

    def __post_init__(self):
        # the switching tail is negligible past ~1.5·r0; require coverage
        assert self.r0 * 1.5 <= self.spec.r_list + 1e-6, (
            "coordination r0 too large for the cell stencil")

    @property
    def log_name(self) -> str:
        return f"cv_{self.name}"

    def value(self, state: PackedState, system: System) -> jax.Array:
        r02 = self.r0 ** 2

        def per_pair(dx, dy, dz, r2, w):
            # [1−(r/r0)^6]/[1−(r/r0)^12] ≡ 1/(1+(r/r0)^6): regular form —
            # the quotient form NaN-poisons autodiff near r = r0
            y3 = (r2 / r02) ** 3          # (r/r0)^6
            s = 1.0 / (1.0 + y3)
            return (jnp.sum(w * s),)

        (tot,) = _offset_pair_sweep(state, self.spec, per_pair)
        return tot / self.spec.n_real
