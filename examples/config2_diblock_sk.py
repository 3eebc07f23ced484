"""BASELINE Config 2: well-tempered MTD, 1D S(k) CV, bead-spring diblock
copolymer melt N=8192 — packed engine with in-kernel FENE bonds.

Run: python examples/config2_diblock_sk.py [--steps 50000]
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
from metadyn_tpu.bias.metad import HillSpec, WallSpec, WELL_TEMPERED
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.integrate.base import run_steps
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.sampler import MetadSampler
from metadyn_tpu.utils.lattice import polymer_melt
from metadyn_tpu.io.metrics import CSVLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--chains", type=int, default=512)   # 512×16 = 8192 beads
    ap.add_argument("--chain-len", type=int, default=16)
    args = ap.parse_args()

    n = args.chains * args.chain_len
    rho = 0.85
    L = float((n / rho) ** (1 / 3))
    kT = 1.0
    pos, bonds = polymer_melt(args.chains, args.chain_len, L, seed=0)

    # soft push-off to remove random-walk overlaps (particle-order engine)
    system = make_system(n, bonds=bonds)
    push = ForceField(
        pair_params=soft_tables(1, A=100.0, r_cut=1.0), pair_kernel=soft_kernel,
        row_block=1024,
        fene=FENEBondParams(k=jnp.asarray([30.0]), r0=jnp.asarray([1.5]),
                            epsilon=jnp.asarray([1.0]), sigma=jnp.asarray([1.0])))
    fa = push.bind(system)
    st0 = fa(make_state(pos, Box.cubic(L)))
    step0 = make_langevin_step(fa, system, dt=0.002, kT=kT, gamma=2.0)
    print("push-off...", flush=True)
    st0 = jax.jit(lambda s: run_steps(step0, s, jax.random.PRNGKey(7), 2000))(st0)
    pos = np.asarray(st0.unwrapped_pos())

    # diblock typing: first half A (+1), second half B (−1)
    t = np.zeros((args.chains, args.chain_len), np.int32)
    t[:, args.chain_len // 2:] = 1
    types = t.reshape(-1)
    coef = np.asarray([1.0, -1.0], np.float32)[types]
    system = make_system(n, types=types, bonds=bonds)

    spec = PackedSpec.create(L, n, r_cut=2 ** (1 / 6), skin=0.5, cap=40,
                             fene_k=30.0, fene_r0=1.5)
    engine = PackedEngine(spec)
    k0 = 2 * np.pi * 2 / L   # target lamellar period L/2
    cv = PackedMesh.create((32, 32, 32), L, n_real=n, k0=k0, width=0.3,
                           name="sk")
    st, ovf = engine.pack_state(
        pos, Box.cubic(L), jnp.asarray(types), eps_i=jnp.ones(n),
        sigma_i=jnp.ones(n), vel=np.asarray(st0.vel),
        extra_attrs={**bond_partner_attrs(bonds, n), cv.attr_name: coef})
    assert not bool(ovf)

    s0 = float(cv.value(st, system))
    hi = max(8.0 * s0, 10.0)
    grid = GridSpec.create([0.0], [hi], [201], [hi / 80])
    sampler = MetadSampler(
        system, st, engine, cvs=[cv], grid_spec=grid,
        hills=HillSpec.create(W=0.5, stride=250, mode=WELL_TEMPERED,
                              deltaT=5.0),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.004, kT=kT, gamma=1.0),
        walls=WallSpec.at_grid_edges(grid, k=100.0),
        hill_file="/tmp/config2_hills.txt", overwrite=True,
        chunks_per_block=8, seed=0)
    log = CSVLogger("/tmp/config2_log.csv", overwrite=True)

    t0 = time.time()
    done = 0
    while done < args.steps:
        todo = min(250 * 8, args.steps - done)
        hist = sampler.run(todo)
        done += todo
        log.append(hist)
        m = hist[-1]
        print(f"step {int(m['step'])}: S(k0)={float(m['cv'][0]):.3f} "
              f"T={float(m['temperature']):.2f} V={float(m['bias_V']):.2f}",
              flush=True)
    rate = done * n / (time.time() - t0)
    print(f"done: {rate/1e6:.1f}M particle-steps/s")


if __name__ == "__main__":
    main()
