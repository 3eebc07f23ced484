"""Multiple-walker metadynamics: replicas sharded over a device mesh.

Reference parity: HOOMD MPI partitions (``--nrank``) running independent
replicas that share ONE bias grid, allreduced at every deposition stride
(SURVEY.md §2b, §3.1 "multiple walkers: MPI_Allreduce(grid delta)").

TPU-native re-design (BASELINE.json:10, SURVEY.md §7 P6): one walker per
chip on a ``Mesh`` axis ``"walkers"``; the whole stride chunk (MD scan +
CV + hill field) runs under ``shard_map``; the grid delta is a single
``psum`` over the walker axis riding ICI.  Each walker computes its
well-tempered hill height against the *pre-stride* grid — exactly the
reference's partition semantics — then all deltas are applied at once.

The PRNG key is folded per (walker, step): walker streams are independent
and bitwise reproducible regardless of mesh size (SURVEY.md §7 hard
part 5).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.state import System
from ..bias.grid import GridSpec, hill_field, value_and_grad
from ..bias.metad import BiasState, HillSpec, hill_height
from ..io.hill_log import HillLog
from ..sampler import (
    cv_stack, make_biased_force, make_bias_force_parts, _CallableEngine,
)


def _shard_map(fn, mesh, in_specs, out_specs, axis_names=None):
    """shard_map; ``axis_names`` selects partial-manual axes (used when
    ``mesh`` carries more axes than ``"walkers"`` — the walkers x space
    product, where ``"space"`` stays auto here and goes manual inside the
    spatial engine's nested islands)."""
    if hasattr(jax, "shard_map"):
        kw = {}
        if axis_names is not None:
            kw["axis_names"] = frozenset(axis_names)
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, **kw)
    from jax.experimental.shard_map import shard_map as sm
    assert axis_names is None, (
        "partial-manual shard_map needs jax.shard_map (axis_names)")
    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _nearest_node(spec: GridSpec, s):
    """Per-dimension nearest-grid-node indices for an s stack (d,)."""
    idx = []
    for d in range(spec.ndim):
        b = jnp.round((s[d] - spec.lo[d]) / spec.spacing(d)).astype(jnp.int32)
        n = spec.shape[d]
        idx.append(jnp.mod(b, n) if spec.periodic[d] else jnp.clip(b, 0, n - 1))
    return tuple(idx)


def make_walker_chunk(
    engine,
    cvs,
    system: System,
    hills: HillSpec,
    integrator_factory: Callable,
    axis: str = "walkers",
    walls=None,
    cv_hist_spec: Optional[GridSpec] = None,
    add_hills: bool = True,
    bias_every: int = 1,
):
    """Per-walker stride chunk (runs inside shard_map on ONE walker).

    carry = (state, aux, key, step), bias replicated.  Returns the updated
    per-walker carry, the synchronized bias, this walker's hill record, and
    (with ``cv_hist_spec``) the stride's walker-summed per-STEP CV visit
    histogram — the raw material of the reweighted FES estimator
    F̂ = −V̄ − kT·ln h (see :meth:`WalkerSampler.free_energy`).  The
    histogram re-evaluates the CV stack once per MD step: negligible for
    cheap CVs; opt-in because packed order CVs would double their sweeps.

    ``bias_every`` > 1 is the same bias-force multiple-time-stepping as
    :class:`MetadSampler` (sampler.make_stride_chunk): the CV sweeps +
    ∂V/∂s run once per ``bias_every`` MD steps with the bias force held
    constant in between (exact pair/bond forces every step).  It is
    walker-LOCAL — the hill-field psum still only happens at the stride
    tail, so MTS and walker sync compose orthogonally (the reference's
    partitions place no constraint on the bias cadence either).  The CV
    visit histogram then subsamples at the same cadence (weight
    ``bias_every`` per eval), which preserves the h-ratios the
    reweighted estimator consumes."""
    biased_force = make_biased_force(engine, cvs, system, walls)
    r = min(engine.rebuild_every, hills.stride)
    assert hills.stride % r == 0
    n_blocks = hills.stride // r
    if bias_every > 1:
        assert r % bias_every == 0, (
            f"bias_every={bias_every} must divide "
            f"min(rebuild_every, stride)={r}")
    eval_bias, apply_force = make_bias_force_parts(engine, cvs, system,
                                                   walls)

    def chunk(state, aux, key, step, bias: BiasState):
        hist0 = None
        if cv_hist_spec is not None:
            hist0 = jnp.zeros(cv_hist_spec.shape)
            # the per-step update depends on this walker's state, so the
            # carry must enter the scan already device-varying over the
            # walker axis (shard_map varying-manual-axes check)
            hist0 = jax.lax.pcast(hist0, (axis,), to="varying")

        def block(c, b):
            st, ax, hs = c
            st, ax = engine.rebuild(st, ax)
            if bias_every > 1:
                def sub(inner, j):
                    st, hs = inner
                    g, dVds, sv = eval_bias(st, ax, bias)
                    if cv_hist_spec is not None:
                        hs = hs.at[_nearest_node(cv_hist_spec, sv)].add(
                            float(bias_every))
                    force_fn = lambda s2: apply_force(s2, ax, g, dVds)
                    step_fn = integrator_factory(force_fn)

                    def body(s2, i):
                        k = jax.random.fold_in(
                            key, step + b * r + j * bias_every + i)
                        return step_fn(s2, k), None

                    st, _ = jax.lax.scan(body, st, jnp.arange(bias_every))
                    return (st, hs), None

                (st, hs), _ = jax.lax.scan(
                    sub, (st, hs), jnp.arange(r // bias_every))
                return (st, ax, hs), None
            step_fn = integrator_factory(lambda s: biased_force(s, ax, bias))

            def body(carry, i):
                st, hs = carry
                st = step_fn(st, jax.random.fold_in(key, step + b * r + i))
                if cv_hist_spec is not None:
                    sv = cv_stack(cvs, st, system)
                    hs = hs.at[_nearest_node(cv_hist_spec, sv)].add(1.0)
                return (st, hs), None

            (st, hs), _ = jax.lax.scan(body, (st, hs), jnp.arange(r))
            return (st, ax, hs), None

        (state, aux, hist), _ = jax.lax.scan(
            block, (state, aux, hist0), jnp.arange(n_blocks))
        if hist is not None:
            hist = jax.lax.psum(hist, axis)
        state = engine.refresh_energy(state, aux)
        s = cv_stack(cvs, state, system)
        if add_hills:
            # WT height against the pre-stride grid (reference partition
            # semantics)
            h = hill_height(hills, bias, s)
            dV, ddV = hill_field(bias.grid.spec, s, h)
            # ONE allreduce of the grid delta over ICI — the multi-walker
            # sync
            dV = jax.lax.psum(dV, axis)
            ddV = jax.lax.psum(ddV, axis)
            n_w = jax.lax.psum(jnp.int32(1), axis)
            new_bias = BiasState(
                grid=bias.grid.replace(V=bias.grid.V + dV,
                                       dV=bias.grid.dV + ddV),
                n_hills=bias.n_hills + n_w,
            )
        else:
            # frozen shared bias (reference ``add_hills=False``): all
            # walkers sample under the same static grid — no deposit, no
            # allreduce
            h = jnp.float32(0.0)
            new_bias = bias
        V_here, _ = value_and_grad(new_bias.grid, s)
        metrics = {
            "cv": s,
            "hill_height": h,
            "bias_V": V_here,
            "cv_out_of_grid": jnp.any((s < bias.grid.spec.lo)
                                      | (s > bias.grid.spec.hi)),
            **engine.metrics(state, aux),
        }
        return state, aux, new_bias, (s, h), metrics, hist

    return chunk


class WalkerSampler:
    """Host driver for n_walkers = n_devices replicas with a shared grid.

    Mirrors ``mode_metadynamics(..., multiple_walkers=True)`` run under
    ``mpirun --nranks W`` in the reference.
    """

    def __init__(
        self,
        system: System,
        states,                      # pytree batched on leading walker axis
        engine,
        cvs,
        grid_spec: GridSpec,
        hills: HillSpec,
        integrator_factory,
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        initial_bias: Optional[BiasState] = None,
        walls=None,
        hill_file: Optional[str] = None,
        overwrite: bool = False,
        chunks_per_block: int = 16,
        measure_cv_hist: bool = False,
        add_hills: bool = True,
        bias_every: int = 1,
    ):
        """``measure_cv_hist=True`` accumulates the walker-summed per-step
        CV visit histogram on device (one extra CV eval per step — meant
        for cheap CVs / convergence oracles).  Call
        :meth:`begin_measurement` after the transient, then
        :meth:`free_energy` returns the histogram-reweighted estimate.

        ``bias_every`` > 1 enables per-walker bias-force MTS (see
        :func:`make_walker_chunk`)."""
        if not hasattr(engine, "force_into"):
            engine = _CallableEngine(engine, system)
        devices = np.asarray(jax.devices())
        self.mesh = mesh or Mesh(devices, ("walkers",))
        self.n_walkers = self.mesh.shape["walkers"]
        self.engine = engine
        self.system = system
        self.cvs = list(cvs)
        self.hills = hills
        self.grid_spec = grid_spec
        bias = initial_bias if initial_bias is not None else BiasState.zeros(grid_spec)
        chunk = make_walker_chunk(
            engine, cvs, system, hills, integrator_factory, walls=walls,
            cv_hist_spec=grid_spec if measure_cv_hist else None,
            add_hills=add_hills, bias_every=bias_every)

        def run_one(state, aux, key, step, bias):
            # squeeze the per-device walker axis (1 walker per device)
            state = jax.tree.map(lambda x: x[0], state)
            aux = jax.tree.map(lambda x: x[0], aux)
            state, aux, new_bias, hill, metrics, hist = chunk(
                state, aux, key[0], step, bias)
            expand = lambda t: jax.tree.map(lambda x: x[None], t)
            return (expand(state), expand(aux), key,
                    new_bias, expand(hill), expand(metrics), hist)

        wspec = P("walkers")
        # product meshes (walkers x space): only "walkers" goes manual
        # here; the spatial engine's nested islands manualize "space"
        manual = (("walkers",) if len(self.mesh.axis_names) > 1 else None)
        run_chunk = _shard_map(
            run_one, self.mesh,
            in_specs=(wspec, wspec, wspec, P(), P()),
            out_specs=(wspec, wspec, wspec, P(), wspec, wspec, P()),
            axis_names=manual,
        )

        # chunked host loop (MetadSampler parity): one dispatch covers
        # ``chunks_per_block`` strides via lax.scan over the shard_mapped
        # stride chunk
        def run_block(states, auxs, keys, step, bias, n):
            # measurement accumulators: per-step CV visit histogram and the
            # per-stride time average of the bias grid (V̄ in the reweighted
            # estimator F̂ = −V̄ − kT·ln h; averaging per stride, not per
            # block, tracks the still-depositing WT bias closely enough)
            hacc0 = (jnp.zeros(grid_spec.shape) if measure_cv_hist
                     else None)
            vacc0 = (jnp.zeros(grid_spec.shape) if measure_cv_hist
                     else None)

            def body(c, _):
                st, ax, ks, stp, b, ha, va = c
                st, ax, ks, b, hill, metrics, hist = run_chunk(
                    st, ax, ks, stp, b)
                if ha is not None:
                    ha = ha + hist
                    va = va + b.grid.V
                return ((st, ax, ks, stp + hills.stride, b, ha, va),
                        (hill, metrics))
            (st, ax, ks, stp, b, ha, va), (hill, metrics) = jax.lax.scan(
                body, (states, auxs, keys, step, bias, hacc0, vacc0),
                None, length=n)
            return st, ax, ks, stp, b, hill, metrics, ha, va

        self._block = chunks_per_block
        self._run_block = jax.jit(run_block, static_argnums=5)

        # init per-walker forces (vmapped, in ONE jit — eager dispatch of
        # the vmapped init is op-by-op and dominates construction time)
        def init_one(st):
            st, aux = engine.init(st)
            st = make_biased_force(engine, cvs, system, walls)(st, aux, bias)
            return st, aux

        if getattr(engine, "_nested_islands", False):
            # spatial engine under the walker axis: its halo islands can't
            # be vmapped — init each walker inside the same walker
            # shard_map the run path uses
            def init_w(sts):
                st = jax.tree.map(lambda x: x[0], sts)
                st, aux = init_one(st)
                expand = lambda t: jax.tree.map(lambda x: x[None], t)
                return expand(st), expand(aux)

            init_fn = _shard_map(init_w, self.mesh, (wspec,),
                                 (wspec, wspec), axis_names=manual)
            states, auxs = jax.jit(init_fn)(states)
        else:
            try:
                states, auxs = jax.jit(jax.vmap(init_one))(states)
            except (jax.errors.ConcretizationTypeError,
                    jax.errors.TracerArrayConversionError):
                states, auxs = jax.vmap(init_one)(states)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(seed), jnp.arange(self.n_walkers))
        self.states = states
        self.auxs = auxs
        self.keys = keys
        self.bias = bias
        self.step = jnp.int32(0)
        self._measure = measure_cv_hist
        self._meas_h: Optional[np.ndarray] = None
        self._meas_V: Optional[np.ndarray] = None
        self._meas_n = 0
        self.history: list[dict] = []
        self.hill_log = (HillLog(hill_file, self, overwrite=overwrite)
                         if hill_file and add_hills else None)

    def run(self, n_steps: int) -> list[dict]:
        stride = self.hills.stride
        assert n_steps % stride == 0
        n_chunks = n_steps // stride
        out = []
        remaining = n_chunks
        while remaining > 0:
            n = self._block if remaining >= self._block else remaining
            (self.states, self.auxs, self.keys, self.step, self.bias,
             hill, metrics, ha, va) = self._run_block(
                self.states, self.auxs, self.keys, self.step, self.bias, n)
            hill, metrics = jax.device_get((hill, metrics))
            if self._meas_h is not None and ha is not None:
                self._meas_h += np.asarray(ha)
                self._meas_V += np.asarray(va)
                self._meas_n += n
            for i in range(n):
                out.append({k: np.asarray(v[i]) for k, v in metrics.items()})
            if self.hill_log is not None:
                self._append_hills(hill, n, int(self.step) - n * stride)
            remaining -= n
        self.history.extend(out)
        return out

    def _append_hills(self, hill, n_chunks: int, step0: int) -> None:
        """One hill-file row per (stride, walker) — the reference's
        multiple-walker hill log (every partition appends its hill)."""
        from ..bias.metad import HillRecord
        centers, heights = hill           # (n, W, d) / (n, W)
        stride = self.hills.stride
        steps = np.repeat(
            step0 + stride * (1 + np.arange(n_chunks)), self.n_walkers)
        self.hill_log.append(HillRecord(
            step=steps,
            center=np.asarray(centers).reshape(-1, centers.shape[-1]),
            height=np.asarray(heights).reshape(-1)))

    # --- reweighted FES estimator ---------------------------------------
    def begin_measurement(self) -> None:
        """Start (or reset) the reweighted-FES measurement phase.

        Requires ``measure_cv_hist=True`` at construction.  Subsequent
        :meth:`run` calls accumulate the walker-summed per-step CV visit
        histogram h and the per-stride time average V̄ of the bias grid;
        :meth:`free_energy` then returns

            F̂(s) = −V̄(s) − kT·ln h(s)

        which is exact for a frozen or slowly-varying bias — it removes
        both the WT rescaling approximation and the hill-width smoothing
        bias that cap the plain −(T+ΔT)/ΔT·V estimator at ~0.12–0.19 kT
        on the 2-D double-well oracle (round-3 accuracy push, VERDICT r2
        weak #3).  Call after the transient."""
        assert self._measure, "construct with measure_cv_hist=True"
        self._meas_h = np.zeros(self.grid_spec.shape)
        self._meas_V = np.zeros(self.grid_spec.shape)
        self._meas_n = 0

    def free_energy(self, kT: float) -> np.ndarray:
        """FES estimate, min-shifted to 0.  Histogram-reweighted if a
        measurement phase is active (see :meth:`begin_measurement`),
        otherwise the standard (well-)tempered −V rescaling."""
        if self._meas_n and self._meas_h is not None:
            Vbar = self._meas_V / self._meas_n
            F = -Vbar - kT * np.log(np.maximum(self._meas_h, 1.0))
        else:
            from ..bias.metad import free_energy as _fes
            F = np.asarray(_fes(self.hills, self.bias, jnp.float32(kT)))
        return F - F.min()

    # --- persistence (MetadSampler parity) -------------------------------
    def dump_grid(self, path: str) -> None:
        from ..io.grid_file import dump_grid
        dump_grid(path, self.bias, mode=self.hills.mode,
                  deltaT=float(self.hills.deltaT))

    def save_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import save_checkpoint
        extra = {}
        if self._meas_h is not None:
            # reweighted-FES accumulators — losing them on resume would
            # silently change the free_energy estimate (flux parity)
            extra.update(meas_h=self._meas_h, meas_V=self._meas_V,
                         meas_n=self._meas_n)
        save_checkpoint(path, (self.states, self.auxs, self.keys,
                               self.bias, self.step), extra=extra)

    def load_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import load_checkpoint
        (self.states, self.auxs, self.keys, self.bias, self.step), extras = \
            load_checkpoint(path, (self.states, self.auxs, self.keys,
                                   self.bias, self.step))
        if "meas_h" in extras:
            self._meas_h = np.asarray(extras["meas_h"])
            self._meas_V = np.asarray(extras["meas_V"])
            self._meas_n = int(extras["meas_n"])
