"""Force engines: force evaluation + auxiliary structures (neighbor lists).

The reference separates ``ForceCompute`` (per-step) from ``NeighborList``
(rebuilt on demand via a distance check, SURVEY.md §2b).  On TPU a
data-dependent rebuild inside ``lax.scan`` would force a host sync or a
both-branches ``cond``, so the engine instead rebuilds on a **fixed
cadence** (``rebuild_every`` steps, SURVEY.md §7 hard part 1): the skin is
sized so that half-skin violations within a block are rare, and an actual
violation (tracked via the displacement check) raises an overflow metric
rather than silently corrupting forces.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .state import State, System
from .box import Box
from ..ops.pairs import PairKernel, PairParams, PairForceResult, all_pairs_force
from ..ops import bonds as bond_ops
from ..ops.cell_list import (
    CellSpec, NeighborList, build_neighbor_list, needs_rebuild,
)
from ..ops.neighbor_force import neighbor_pair_force


@struct.dataclass
class EngineAux:
    """Auxiliary carry for a force engine (empty for all-pairs)."""

    nbr: Optional[NeighborList] = None
    # sticky flags accumulated across rebuilds within a run segment
    overflow: jax.Array = struct.field(default_factory=lambda: jnp.asarray(False))
    stale: jax.Array = struct.field(default_factory=lambda: jnp.asarray(False))


class ForceEngine:
    """Base: composition of bond/external terms shared by both engines."""

    rebuild_every: int = 10**9  # all-pairs: never

    def __init__(self, system: System, harmonic=None, fene=None, external=None):
        self.system = system
        self.harmonic = harmonic
        self.fene = fene
        self.external = external

    def _common(self, state: State) -> PairForceResult:
        e = jnp.float32(0.0)
        f = jnp.zeros_like(state.pos)
        w = jnp.float32(0.0)
        if self.harmonic is not None:
            r = bond_ops.harmonic_bond_force(
                state.pos, self.system.bonds, self.system.bond_types,
                state.box, self.harmonic)
            e, f, w = e + r.energy, f + r.force, w + r.virial
        if self.fene is not None:
            r = bond_ops.fene_bond_force(
                state.pos, self.system.bonds, self.system.bond_types,
                state.box, self.fene)
            e, f, w = e + r.energy, f + r.force, w + r.virial
        if self.external is not None:
            e_ext, g = jax.value_and_grad(self.external)(
                state.pos, state, self.system)
            e, f = e + e_ext, f - g
        return PairForceResult(e, f, w)

    def init_aux(self, state: State) -> EngineAux:
        return EngineAux()

    def rebuild(self, state: State, aux: EngineAux) -> EngineAux:
        return aux

    def force(self, state: State, aux: EngineAux) -> PairForceResult:
        raise NotImplementedError


class AllPairsEngine(ForceEngine):
    """O(N²) masked reference engine (small systems, oracle for the list)."""

    def __init__(self, system: System, pair_params: Optional[PairParams] = None,
                 pair_kernel: Optional[PairKernel] = None, row_block: int = 1024,
                 harmonic=None, fene=None, external=None):
        super().__init__(system, harmonic, fene, external)
        self.pair_params = pair_params
        self.pair_kernel = pair_kernel
        self.row_block = row_block

    def force(self, state: State, aux: EngineAux) -> PairForceResult:
        res = self._common(state)
        if self.pair_params is not None:
            r = all_pairs_force(state.pos, self.system.types, state.box,
                                self.pair_kernel, self.pair_params, self.row_block)
            res = PairForceResult(res.energy + r.energy, res.force + r.force,
                                  res.virial + r.virial)
        return res


class NeighborEngine(ForceEngine):
    """Cell-list neighbor engine — the production path (SURVEY.md §7 P4)."""

    def __init__(self, system: System, cell_spec: CellSpec,
                 pair_params: PairParams, pair_kernel: PairKernel,
                 rebuild_every: int = 10,
                 exclusions: Optional[jax.Array] = None,
                 harmonic=None, fene=None, external=None):
        super().__init__(system, harmonic, fene, external)
        self.cell_spec = cell_spec
        self.pair_params = pair_params
        self.pair_kernel = pair_kernel
        self.rebuild_every = rebuild_every
        self.exclusions = exclusions

    def init_aux(self, state: State) -> EngineAux:
        nbr = build_neighbor_list(state.pos, state.box, self.cell_spec,
                                  self.exclusions)
        return EngineAux(nbr=nbr, overflow=nbr.overflow,
                         stale=jnp.asarray(False))

    def rebuild(self, state: State, aux: EngineAux) -> EngineAux:
        # record a half-skin violation BEFORE rebuilding: it means some steps
        # in the previous block ran with a stale list
        stale = aux.stale | needs_rebuild(aux.nbr, state.pos, state.box)
        nbr = build_neighbor_list(state.pos, state.box, self.cell_spec,
                                  self.exclusions)
        return EngineAux(nbr=nbr, overflow=aux.overflow | nbr.overflow,
                         stale=stale)

    def force(self, state: State, aux: EngineAux) -> PairForceResult:
        res = self._common(state)
        r = neighbor_pair_force(state.pos, self.system.types, state.box,
                                aux.nbr, self.pair_kernel, self.pair_params)
        return PairForceResult(res.energy + r.energy, res.force + r.force,
                               res.virial + r.virial)


def run_md_blocks(
    engine: ForceEngine,
    step_factory: Callable,
    state: State,
    aux: EngineAux,
    key: jax.Array,
    n_steps: int,
    start_step: jax.Array | int = 0,
) -> tuple[State, EngineAux]:
    """Run n_steps with periodic neighbor rebuilds, fully on device.

    Structure: scan over blocks of ``rebuild_every`` steps, rebuilding at
    each block head (static shapes, no host sync; SURVEY.md §7 tenet 1).
    """
    r = min(engine.rebuild_every, n_steps)
    n_blocks, rem = divmod(n_steps, r)
    assert rem == 0, f"n_steps={n_steps} must be a multiple of rebuild_every={r}"
    start_step = jnp.asarray(start_step, jnp.int32)

    def block(carry, b):
        state, aux = carry
        aux = engine.rebuild(state, aux)
        step = step_factory(lambda st: engine.force(st, aux))

        def body(st, i):
            return step(st, jax.random.fold_in(key, start_step + b * r + i)), None

        state, _ = jax.lax.scan(body, state, jnp.arange(r))
        return (state, aux), None

    (state, aux), _ = jax.lax.scan(block, (state, aux), jnp.arange(n_blocks))
    return state, aux
