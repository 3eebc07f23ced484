"""BASELINE Config 5: flux-tempered metadynamics, ~1M-particle
block-copolymer DSA with the packed cell engine + incremental repack.

Run: python examples/config5_flux_1m.py [--chains 65536 --chain-len 16]
(defaults give 1,048,576 beads; use smaller values for a quick check)
"""
import argparse
import time

import jax

from metadyn_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import PackedSpec, bond_partner_attrs
from metadyn_tpu.ops.pairs import soft_tables, soft_kernel
from metadyn_tpu.ops.bonds import FENEBondParams
from metadyn_tpu.cv.packed import PackedMesh
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.flux_sampler import FluxTemperedSampler
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.utils.lattice import polymer_melt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=65536)
    ap.add_argument("--chain-len", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--bias-every", type=int, default=1,
                    help="bias-force MTS: mesh-CV sweep every k steps")
    args = ap.parse_args()
    n = args.chains * args.chain_len
    rho = 0.85
    L = float((n / rho) ** (1 / 3))
    kT = 1.0
    print(f"N={n} L={L:.1f}", flush=True)
    pos, bonds = polymer_melt(args.chains, args.chain_len, L, seed=0,
                              grid_starts=True, persistence=0.9)

    # soft push-off (particle-order path is O(N²)-blocked: fine to ~64k;
    # at 1M use a packed soft engine or pre-relaxed coordinates — here we
    # push off with a SHORT soft run using the packed engine itself)
    t = np.zeros((args.chains, args.chain_len), np.int32)
    t[:, args.chain_len // 2:] = 1
    types = t.reshape(-1)
    coef = np.asarray([1.0, -1.0], np.float32)[types]
    system = make_system(n, types=types, bonds=bonds)

    # Phase 1 — TRUE soft (DPD-conservative) push-off on the packed
    # engine (pair_kind="soft" runs the XLA roll path; scales to 1M):
    from metadyn_tpu.ops.packed import unpack_positions
    # capacity from the MEASURED initial occupancy: the random-walk melt
    # clumps whole chains into single cells, far beyond the equilibrium
    # headroom heuristic; the soft phase is short so slots are cheap
    def max_occupancy(p, box_len, width_count):
        cell = (np.floor((p / box_len + 0.5) * width_count).astype(np.int64)
                % width_count)
        cid = (cell[:, 0] * width_count + cell[:, 1]) * width_count + cell[:, 2]
        return int(np.bincount(cid).max())

    # small cells (r_list = 2.0) keep the worst-case capacity low: the
    # random melt's chain blobs inflate per-cell occupancy ~4x at 3.0
    cpd_soft = int(np.floor(L / 2.0))
    occ0 = max_occupancy(pos, L, cpd_soft)
    soft_spec = PackedSpec.create(L, n, r_cut=1.0, skin=1.0,
                                  cap=int(occ0 * 1.4) + 6,
                                  pair_kind="soft",
                                  fene_k=30.0, fene_r0=1.5)
    soft_engine = PackedEngine(soft_spec, rebuild_every=5)
    st, ovf = soft_engine.pack_state(
        pos, Box.cubic(L), jnp.asarray(types),
        eps_i=jnp.full(n, 100.0), sigma_i=jnp.ones(n),   # A = 100
        extra_attrs=bond_partner_attrs(bonds, n))
    assert not bool(ovf)
    st, aux = jax.jit(soft_engine.init)(st)   # jit: eager init at 1M
                                              # materializes huge temps
    soft_step = make_packed_langevin_step(
        lambda s: soft_engine.force_into(s, None), dt=0.002, kT=kT, gamma=2.0)

    @jax.jit
    def pushoff(st, aux, key):
        def block(c, b):
            s2, a2 = soft_engine.rebuild(*c)
            def body(s, i):
                return soft_step(s, jax.random.fold_in(key, b * 5 + i)), None
            s2, _ = jax.lax.scan(body, s2, jnp.arange(5))
            return (s2, a2), None
        return jax.lax.scan(block, (st, aux), jnp.arange(200))[0]

    st, aux = pushoff(st, aux, jax.random.PRNGKey(99))
    assert not bool(aux.overflow), "overflow during push-off"
    relaxed = np.asarray(unpack_positions(st, soft_spec))
    vel0 = np.asarray(st.v[:, st.slot_of].T)
    print("push-off done", flush=True)

    # Phase 2 — production WCA+FENE engine
    spec = PackedSpec.create(L, n, r_cut=2 ** (1 / 6), skin=0.5, cap=48,
                             fene_k=30.0, fene_r0=1.5, uniform_sigma=1.0)
    engine = PackedEngine(spec)
    cv = PackedMesh.create((48, 48, 48), L, n_real=n,
                           k0=2 * np.pi * 4 / L, width=0.3, name="dsa")
    st, ovf = engine.pack_state(
        relaxed, Box.cubic(L), jnp.asarray(types),
        eps_i=jnp.ones(n), sigma_i=jnp.ones(n), vel=vel0,
        extra_attrs={**bond_partner_attrs(bonds, n), cv.attr_name: coef})
    print("pack overflow:", bool(ovf), flush=True)

    s0 = float(cv.value(st, system))
    hi = max(8.0 * s0, 10.0)
    sampler = FluxTemperedSampler(
        system, st, engine, cvs=[cv],
        grid_spec=GridSpec.create([0.0], [hi], [101], [hi / 40]),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.002, kT=kT, gamma=2.0),
        # short update periods keep the compiled program small (the
        # remote-compile service struggles with very long fused periods
        # at the 1M scale); more periods, same physics
        kT=kT, stride=50, update_period=4, seed=0,
        bias_every=args.bias_every)

    t0 = time.time()
    done = 0
    while done < args.steps:
        todo = 50 * 4
        out = sampler.run(todo)
        done += todo
        m = out[-1]
        print(f"step {done}: S(k)={float(np.asarray(m['cv'])[-1][0]):.3f} "
              f"T={float(np.asarray(m['temperature'])[-1]):.2f} "
              f"updates={sampler.n_updates}", flush=True)
    rate = done * n / (time.time() - t0)
    print(f"done: {rate/1e6:.1f}M particle-steps/s (flux-tempered, "
          f"{sampler.n_updates} bias updates)")


if __name__ == "__main__":
    main()
