"""Command-line driver: ``metadyn run config.yaml``.

Reference parity: the reference's "config" is python-constructor kwargs
plus HOOMD CLI flags (SURVEY.md §5 config/flag system); here a typed YAML
config drives the same parameter names.  `examples/` contains configs for
the baseline set (BASELINE.md Configs 1–4).
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_sampler(cfg: dict):
    import jax
    import jax.numpy as jnp
    from .core.box import Box
    from .core.state import make_state, make_system, thermal_velocities
    from .core.forcefield import ForceField
    from .core.engine import AllPairsEngine
    from .core.packed_engine import PackedEngine
    from .ops.packed import PackedSpec
    from .ops import pairs as pair_mod
    from .integrate.langevin import make_langevin_step
    from .integrate.packed import make_packed_langevin_step
    from .cv.lamellar import LamellarOP
    from .cv.mesh import MeshOrderParameter
    from .cv.steinhardt import SteinhardtQl
    from .cv.msd import MSD
    from .cv.packed import PackedLamellar
    from .bias.grid import GridSpec
    from .bias.metad import HillSpec, WallSpec
    from .sampler import MetadSampler
    from .utils import lattice

    sys_cfg = cfg["system"]
    kT = float(cfg["integrator"].get("kT", 1.0))

    # --- initial configuration -------------------------------------------
    init = sys_cfg["init"]
    kind = init["kind"]
    if kind == "fcc":
        pos = lattice.fcc_lattice(init["n_cells"], init["a"])
        L = init["n_cells"] * init["a"]
        bonds = None
    elif kind == "sc":
        pos = lattice.sc_lattice(init["n_per_side"], init["spacing"])
        L = init["n_per_side"] * init["spacing"]
        bonds = None
    elif kind == "melt":
        L = init["box_L"]
        pos, bonds = lattice.polymer_melt(
            init["n_chains"], init["chain_len"], L,
            seed=init.get("seed", 0))
    else:
        raise ValueError(f"unknown init kind {kind}")
    n = pos.shape[0]
    box = Box.cubic(float(L))
    types = np.asarray(sys_cfg.get("types", np.zeros(n)), np.int32)
    system = make_system(n, types=types, bonds=bonds)

    rng = np.random.default_rng(int(cfg.get("seed", 0)))
    vel = rng.normal(0, np.sqrt(kT), (n, 3)).astype(np.float32)
    vel -= vel.mean(axis=0)

    # --- engine ------------------------------------------------------------
    eng_cfg = cfg["engine"]
    pair = eng_cfg.get("pair", {"kind": "lj", "r_cut": 2.5})
    cvs_cfg = cfg.get("cvs", [])
    if eng_cfg["kind"] == "packed":
        spec = PackedSpec.create(
            L, n, r_cut=float(pair["r_cut"]),
            skin=float(eng_cfg.get("skin", 0.4)),
            cap=eng_cfg.get("cap"),
            shift_energy=bool(pair.get("shift", False)))
        engine = PackedEngine(spec)
        cvs, extra_attrs = [], {}
        for c in cvs_cfg:
            assert c["kind"] == "lamellar", \
                "packed engine CLI currently supports lamellar CVs"
            cv = PackedLamellar.create([c["lattice_vector"]], n_real=n,
                                       name=c["name"])
            cvs.append(cv)
            extra_attrs[cv.attr_name] = np.asarray(
                c.get("mode", [1.0] * system.n_types), np.float32)[types]
        state, ovf = engine.pack_state(
            pos, box, jnp.asarray(types), eps_i=jnp.ones(n),
            sigma_i=jnp.ones(n), vel=vel, extra_attrs=extra_attrs)
        assert not bool(ovf), "cell capacity overflow at pack"
        integ = lambda f: make_packed_langevin_step(
            f, dt=float(cfg["integrator"]["dt"]), kT=kT,
            gamma=float(cfg["integrator"].get("gamma", 1.0)))
    else:
        tables = {"lj": pair_mod.lj_tables, "wca": pair_mod.wca_tables,
                  "soft": pair_mod.soft_tables}
        kern = {"lj": pair_mod.lj_kernel, "wca": pair_mod.lj_kernel,
                "soft": pair_mod.soft_kernel}[pair["kind"]]
        tab_kwargs = {k: v for k, v in pair.items() if k != "kind"}
        params = tables[pair["kind"]](system.n_types, **tab_kwargs)
        engine = AllPairsEngine(system, pair_params=params, pair_kernel=kern,
                                row_block=int(eng_cfg.get("row_block", 1024)))
        state = make_state(pos, box, vel=vel)
        cvs = []
        for c in cvs_cfg:
            if c["kind"] == "lamellar":
                cvs.append(LamellarOP.create(
                    mode=c.get("mode", [1.0] * system.n_types),
                    lattice_vectors=[c["lattice_vector"]], name=c["name"]))
            elif c["kind"] == "mesh":
                cvs.append(MeshOrderParameter.create(
                    tuple(c["mesh"]), L, mode=c.get("mode", [1.0] * system.n_types),
                    k0=c["k0"], width=c.get("width", 0.5), name=c["name"]))
            elif c["kind"] == "steinhardt":
                cvs.append(SteinhardtQl(r_cut=c["r_cut"], l=c.get("l", 6),
                                        name=c["name"]))
            elif c["kind"] == "msd":
                cvs.append(MSD.create(pos, name=c["name"]))
            else:
                raise ValueError(f"unknown cv kind {c['kind']}")
        integ = lambda f: make_langevin_step(
            f, system, dt=float(cfg["integrator"]["dt"]), kT=kT,
            gamma=float(cfg["integrator"].get("gamma", 1.0)))

    # --- metadynamics -------------------------------------------------------
    mcfg = cfg["metadynamics"]
    grid = GridSpec.create(
        [c["grid"]["min"] for c in cvs_cfg],
        [c["grid"]["max"] for c in cvs_cfg],
        [c["grid"]["num_points"] for c in cvs_cfg],
        [c["grid"]["sigma"] for c in cvs_cfg])
    hills = HillSpec.create(
        W=float(mcfg["W"]), stride=int(mcfg["stride"]),
        mode=mcfg.get("mode", "standard"),
        deltaT=float(mcfg.get("deltaT", 1.0)))
    walls = (WallSpec.at_grid_edges(grid, k=float(mcfg["wall_k"]))
             if "wall_k" in mcfg else None)
    return MetadSampler(
        system, state, engine, cvs=cvs, grid_spec=grid, hills=hills,
        integrator_factory=integ, seed=int(cfg.get("seed", 0)),
        hill_file=cfg.get("output", {}).get("hill_file"),
        overwrite=bool(cfg.get("output", {}).get("overwrite", True)),
        walls=walls,
        chunks_per_block=int(cfg.get("chunks_per_block", 16)),
    ), cfg


def cmd_run(args) -> int:
    import yaml
    from .io.metrics import CSVLogger
    from .io.grid_file import dump_grid

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    sampler, cfg = build_sampler(cfg)
    out_cfg = cfg.get("output", {})
    logger = (CSVLogger(out_cfg["log_file"], overwrite=True)
              if "log_file" in out_cfg else None)
    n_steps = int(cfg["run"]["n_steps"])
    report = int(cfg["run"].get("report_every", n_steps))
    done = 0
    while done < n_steps:
        todo = min(report, n_steps - done)
        hist = sampler.run(todo)
        done += todo
        if logger:
            logger.append(hist)
        m = hist[-1]
        print(f"step {int(m['step'])}: T={float(m['temperature']):.3f} "
              f"cv={np.asarray(m['cv']).round(4).tolist()} "
              f"V={float(m['bias_V']):.3f}", flush=True)
    if "grid_file" in out_cfg:
        dump_grid(out_cfg["grid_file"], sampler.bias,
                  mode=sampler.hills.mode, deltaT=float(sampler.hills.deltaT))
        print(f"grid written to {out_cfg['grid_file']}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="metadyn",
                                description="TPU-native metadynamics MD")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a simulation from a YAML config")
    runp.add_argument("config")
    args = p.parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
