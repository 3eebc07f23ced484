#!/usr/bin/env python
"""Cell-geometry tuning experiment for the 64k headline bench.

Runs the bench.py workload with a candidate (skin, cap, rebuild_every)
and reports rate + the true per-block max cell occupancy (host-binned),
so a tighter grid (more cells, smaller cap → fewer pair candidates) can
be validated before bench.py adopts it.

Usage: python tune_cells.py [skin] [cap] [rebuild_every]
"""
import sys
import time

import jax

from metadyn_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_system
from metadyn_tpu.core.packed_engine import PackedEngine
from metadyn_tpu.ops.packed import PackedSpec, unpack_positions
from metadyn_tpu.integrate.packed import make_packed_langevin_step
from metadyn_tpu.cv.packed import PackedLamellar
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.metad import HillSpec, WallSpec, WELL_TEMPERED
from metadyn_tpu.sampler import MetadSampler

SNAP = "bench_data/liq64k.npz"
KT = 1.0


def max_occ(pos, L, cpd):
    cells = np.floor((np.asarray(pos) % L) / (L / cpd)).astype(np.int64)
    cells = np.clip(cells, 0, cpd - 1)
    flat = (cells[:, 0] * cpd + cells[:, 1]) * cpd + cells[:, 2]
    return int(np.bincount(flat, minlength=cpd**3).max())


def main():
    skin = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reb = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    d = np.load(SNAP)
    liq_pos, liq_vel, L = d["pos"], d["vel"], float(d["L"])
    n = liq_pos.shape[0]
    box = Box.cubic(L)

    spec = PackedSpec.create(L, n, r_cut=2.5, skin=skin, cap=cap,
                             shift_energy=False, uniform_sigma=1.0,
                             uniform_eps=1.0)
    print(f"skin={skin} cap={cap} reb={reb} cells={spec.cells_per_dim} "
          f"C={spec.n_cells}", file=sys.stderr)
    engine = PackedEngine(spec, rebuild_every=reb)
    system = make_system(n)
    cv1 = PackedLamellar.create([[0, 0, 3]], n_real=n, name="a")
    cv2 = PackedLamellar.create([[0, 3, 0]], n_real=n, name="b")
    amps = np.ones(n, np.float32)
    state, overflow = engine.pack_state(
        liq_pos, box, np.zeros(n, np.int32),
        eps_i=np.ones(n, np.float32), sigma_i=np.ones(n, np.float32),
        vel=liq_vel,
        extra_attrs={cv1.attr_name: amps, cv2.attr_name: amps},
    )
    assert not bool(overflow), "overflow at pack"
    stride = 500
    gspec = GridSpec.create([-0.06, -0.06], [0.06, 0.06], [64, 64],
                            [0.004, 0.004])
    sampler = MetadSampler(
        system, state, engine, cvs=[cv1, cv2], grid_spec=gspec,
        hills=HillSpec.create(W=0.1, stride=stride, mode=WELL_TEMPERED,
                              deltaT=5.0),
        integrator_factory=lambda f: make_packed_langevin_step(
            f, dt=0.005, kT=KT, gamma=1.0),
        seed=0, bias_every=5, chunks_per_block=8,
        walls=WallSpec.at_grid_edges(gspec, k=2000.0),
    )
    cpd = spec.cells_per_dim[0]
    occ_hist = []
    sampler.run(stride * 8)  # warmup/compile
    t0 = time.time()
    n_meas = stride * 8
    hist = sampler.run(n_meas)
    dt = time.time() - t0
    rate = n * n_meas / dt
    m = hist[-1]
    pos = unpack_positions(sampler.carry.state, spec)
    occ_hist.append(max_occ(pos, L, cpd))
    # extended occupancy stress: more biased blocks, occupancy each block
    for b in range(6):
        hist = sampler.run(stride * 8)
        m = hist[-1]
        pos = unpack_positions(sampler.carry.state, spec)
        occ_hist.append(max_occ(pos, L, cpd))
    print(f"rate={rate/1e6:.1f}M ps/s  overflow={bool(m['nlist_overflow'])} "
          f"finite={bool(np.isfinite(m['potential_energy']))} "
          f"occ_max_per_block={occ_hist}", flush=True)


if __name__ == "__main__":
    main()
