"""BASELINE Config 3: 2D CV (Steinhardt Q6 + coordination) crystal
nucleation, 64k LJ particles, grid bias + forces through both CVs.

Run: python examples/config3_nucleation_2dcv.py [--steps 20000]
"""
import argparse
import time

import jax

from metadyn_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_system
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import PackedSpec
from metadyn_tpu.cv.packed_order import PackedSteinhardtQl, PackedCoordination
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.metad import HillSpec, WallSpec, WELL_TEMPERED
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.sampler import MetadSampler
from metadyn_tpu.utils.lattice import fcc_lattice


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--n-cells", type=int, default=25)  # 62.5k particles
    args = ap.parse_args()

    rho = 0.95          # supercooled-ish density
    a = (4.0 / rho) ** (1 / 3)
    pos = fcc_lattice(args.n_cells, a)
    n = pos.shape[0]
    L = args.n_cells * a
    kT = 0.6            # below LJ melting: nucleation regime
    box = Box.cubic(L)
    system = make_system(n)
    spec = PackedSpec.create(L, n, r_cut=2.5, skin=0.4, cap=48,
                             shift_energy=False)
    engine = PackedEngine(spec)
    rng = np.random.default_rng(0)
    vel = rng.normal(0, np.sqrt(kT), (n, 3)).astype(np.float32)
    vel -= vel.mean(axis=0)
    st, ovf = engine.pack_state(pos, box, jnp.zeros(n, jnp.int32),
                                eps_i=jnp.ones(n), sigma_i=jnp.ones(n), vel=vel)
    assert not bool(ovf)

    nn = a / np.sqrt(2)
    q6 = PackedSteinhardtQl(spec=spec, r_cut=nn * 1.2, l=6, name="q6")
    co = PackedCoordination(spec=spec, r0=nn * 1.35, name="coord")
    st, _aux = engine.init(st)
    s0 = [float(q6.value(st, system)), float(co.value(st, system))]
    print(f"initial Q6={s0[0]:.3f} coord={s0[1]:.2f}", flush=True)
    grid = GridSpec.create([0.0, s0[1] * 0.5], [0.7, s0[1] * 1.5], [48, 48],
                           [0.015, s0[1] / 48])
    sampler = MetadSampler(
        system, st, engine, cvs=[q6, co], grid_spec=grid,
        hills=HillSpec.create(W=1.0, stride=200, mode=WELL_TEMPERED,
                              deltaT=3.0),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.004, kT=kT, gamma=1.0),
        walls=WallSpec.at_grid_edges(grid, k=500.0),
        hill_file="/tmp/config3_hills.txt", overwrite=True,
        chunks_per_block=4, seed=0)

    t0 = time.time()
    done = 0
    while done < args.steps:
        todo = min(200 * 4, args.steps - done)
        hist = sampler.run(todo)
        done += todo
        m = hist[-1]
        print(f"step {int(m['step'])}: Q6={float(m['cv'][0]):.3f} "
              f"coord={float(m['cv'][1]):.2f} T={float(m['temperature']):.2f}",
              flush=True)
    rate = done * n / (time.time() - t0)
    print(f"done: {rate/1e6:.1f}M particle-steps/s (2D order-parameter bias)")


if __name__ == "__main__":
    main()
