"""I/O subsystems: atomic checkpoint + bitwise resume, metrics, trajectory,
and the CLI end-to-end on the Config-1 example."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metadyn_tpu.core.box import Box
from metadyn_tpu.core.state import make_state, make_system
from metadyn_tpu.core.forcefield import ForceField
from metadyn_tpu.integrate.langevin import make_langevin_step
from metadyn_tpu.cv.simple import AxisPosition
from metadyn_tpu.bias.grid import GridSpec
from metadyn_tpu.bias.metad import HillSpec, WELL_TEMPERED
from metadyn_tpu.sampler import MetadSampler
from metadyn_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from metadyn_tpu.io.metrics import CSVLogger, JSONLLogger, read_csv
from metadyn_tpu.io.trajectory import TrajectoryWriter, read_trajectory


def _sampler(seed=0):
    def dw(pos, state, system):
        x = pos[0, 0]
        return 2.0 * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)

    system = make_system(1)
    ff = ForceField(external=dw)
    state = make_state(np.asarray([[1.0, 0, 0]], np.float32), Box.cubic(50.0))
    return MetadSampler(
        system, state, ff.bind(system), cvs=[AxisPosition(0, 0, name="x")],
        grid_spec=GridSpec.create([-1.6], [1.6], [81], [0.1]),
        hills=HillSpec.create(W=0.1, stride=25, mode=WELL_TEMPERED, deltaT=4.0),
        integrator_factory=lambda f: make_langevin_step(
            f, system, dt=0.005, kT=0.6, gamma=5.0),
        seed=seed,
    ), system


def test_checkpoint_bitwise_resume(tmp_path):
    """Kill-and-resume reproduces the uninterrupted run bit-for-bit
    (SURVEY.md §5 fault injection)."""
    ckpt = str(tmp_path / "ckpt.npz")
    s1, _ = _sampler(seed=3)
    s1.run(500)
    save_checkpoint(ckpt, s1.carry, extra={"n_updates": 7})
    s1.run(500)
    V_ref = np.asarray(s1.bias.grid.V)
    pos_ref = np.asarray(s1.state.pos)

    # "crashed" process: fresh sampler, load carry, continue identically
    s2, _ = _sampler(seed=3)
    carry, extras = load_checkpoint(ckpt, s2.carry)
    assert int(extras["n_updates"]) == 7
    s2.carry = carry
    s2.run(500)
    np.testing.assert_array_equal(V_ref, np.asarray(s2.bias.grid.V))
    np.testing.assert_array_equal(pos_ref, np.asarray(s2.state.pos))


def test_csv_and_jsonl_loggers(tmp_path):
    s, _ = _sampler()
    hist = s.run(250)
    csv_path = str(tmp_path / "log.csv")
    CSVLogger(csv_path).append(hist)
    back = read_csv(csv_path)
    assert back["step"].shape[0] == 10
    np.testing.assert_allclose(back["temperature"],
                               [float(h["temperature"]) for h in hist],
                               rtol=1e-5)
    assert "cv_0" in back
    j = JSONLLogger(str(tmp_path / "log.jsonl"))
    j.append(hist)
    import json
    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert len(rows) == 10 and "bias_V" in rows[0]


def test_trajectory_roundtrip(tmp_path):
    p = str(tmp_path / "traj.npz")
    w = TrajectoryWriter(p)
    rng = np.random.default_rng(0)
    frames = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(3)]
    for i, fr in enumerate(frames):
        w.append(fr, np.zeros((5, 3), np.int32), [10.0, 10.0, 10.0], step=i * 100)
    back = read_trajectory(p)
    assert back["pos"].shape == (3, 5, 3)
    np.testing.assert_array_equal(back["step"], [0, 100, 200])
    np.testing.assert_allclose(back["pos"][1], frames[1])


def test_dcd_roundtrip_and_append(tmp_path):
    """Binary DCD writer: CHARMM record layout (byte-level header check),
    roundtrip through the independent reader, and append-resume."""
    import struct
    from metadyn_tpu.io.trajectory import (DCDWriter, read_dcd,
                                           make_trajectory_writer)

    p = str(tmp_path / "traj.dcd")
    w = make_trajectory_writer(p)
    assert isinstance(w, DCDWriter)
    rng = np.random.default_rng(1)
    frames = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(3)]
    for i, fr in enumerate(frames):
        w.append(fr, np.zeros((7, 3), np.int32), [9.0, 8.0, 7.0],
                 step=100 + i * 50)
    w.close()
    raw = open(p, "rb").read()
    # Fortran record 1: len=84, 'CORD', NSET=3, ISTART=100, cell flag set
    assert struct.unpack_from("<i", raw, 0)[0] == 84
    assert raw[4:8] == b"CORD"
    icntrl = struct.unpack_from("<20i", raw, 8)
    assert icntrl[0] == 3 and icntrl[1] == 100 and icntrl[10] == 1
    assert icntrl[3] == 200           # NSTEP patched to the last step
    back = read_dcd(p)
    assert int(back["n_frames"]) == 3
    np.testing.assert_allclose(back["pos"], np.stack(frames))
    np.testing.assert_allclose(back["box_L"][0], [9.0, 8.0, 7.0])
    # append-resume (overwrite=False) continues the same file
    w2 = DCDWriter(p, overwrite=False)
    w2.append(frames[0], np.zeros((7, 3), np.int32), [9.0, 8.0, 7.0],
              step=250)
    w2.close()
    back2 = read_dcd(p)
    assert int(back2["n_frames"]) == 4
    np.testing.assert_allclose(back2["pos"][3], frames[0])


def test_gsd_roundtrip_native(tmp_path):
    """GSD writer (native C++ core): v1 byte layout verified at struct
    level, HOOMD-schema chunks round-trip through the INDEPENDENT
    pure-Python reader, frame-0 inheritance, and append-resume."""
    import struct
    from metadyn_tpu.io import gsd_file
    from metadyn_tpu.io.gsd_file import (GSDWriter, read_gsd,
                                         read_gsd_frames, gsd_types)
    from metadyn_tpu.io.trajectory import make_trajectory_writer

    assert gsd_file._lib(), "C++ toolchain expected in this environment"
    p = str(tmp_path / "traj.gsd")
    w = make_trajectory_writer(p)
    assert isinstance(w, GSDWriter)
    rng = np.random.default_rng(2)
    frames = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(3)]
    imgs = [rng.integers(-2, 3, (5, 3)).astype(np.int32) for _ in range(3)]
    for i, (fr, im) in enumerate(zip(frames, imgs)):
        w.append(fr, im, [6.0, 7.0, 8.0], step=10 + 5 * i)
    w.close()

    raw = open(p, "rb").read()
    magic, index_loc, _, nm_loc, _, schema_ver, gsd_ver = \
        struct.unpack_from("<QQQQQII", raw, 0)
    assert magic == 0x65DF65DF65DF65DF
    assert gsd_ver == (1 << 16)                  # v1 layout
    assert schema_ver == (1 << 16) | 4           # hoomd 1.4
    assert raw[48:48 + 11] == b"metadyn_tpu"
    assert raw[112:112 + 5] == b"hoomd"
    # index entries are 32 bytes; first entry lives at index_loc
    frame0, n0, loc0 = struct.unpack_from("<QQq", raw, index_loc)
    assert frame0 == 0 and loc0 >= 256

    doc = read_gsd(p)
    assert doc["schema"] == "hoomd" and len(doc["frames"]) == 3
    f0 = doc["frames"][0]
    np.testing.assert_allclose(f0["particles/position"], frames[0])
    np.testing.assert_array_equal(f0["particles/image"], imgs[0])
    np.testing.assert_allclose(f0["configuration/box"][:3], [6., 7., 8.])
    assert f0["configuration/step"][0] == 10
    assert f0["particles/N"][0] == 5
    assert gsd_types(f0) == ["A"]
    # typeid written only at frame 0; inheritance fills later frames
    assert "particles/typeid" not in doc["frames"][2]
    inh = read_gsd_frames(p)
    np.testing.assert_array_equal(inh[2]["particles/typeid"],
                                  np.zeros(5, np.uint32))
    np.testing.assert_allclose(inh[2]["particles/position"], frames[2])
    assert inh[2]["configuration/step"][0] == 20

    # append-resume replays committed frames then continues
    w2 = GSDWriter(p, overwrite=False)
    w2.append(frames[0], imgs[0], [6.0, 7.0, 8.0], step=25)
    w2.close()
    doc2 = read_gsd(p)
    assert len(doc2["frames"]) == 4
    np.testing.assert_allclose(doc2["frames"][3]["particles/position"],
                               frames[0])
    np.testing.assert_allclose(doc2["frames"][1]["particles/position"],
                               frames[1])


def test_gsd_python_fallback_identical_layout(tmp_path):
    """The pure-Python fallback writer emits the same v1 structure the
    native core does (same reader, same asserted fields)."""
    from metadyn_tpu.io.gsd_file import _PyFile, read_gsd

    p = str(tmp_path / "fb.gsd")
    f = _PyFile(p, "metadyn_tpu", "hoomd", (1 << 16) | 4)
    pos = np.arange(12, dtype=np.float32).reshape(4, 3)
    f.write_chunk("configuration/step", np.asarray([7], np.uint64))
    f.write_chunk("particles/position", pos)
    f.end_frame()
    f.write_chunk("configuration/step", np.asarray([9], np.uint64))
    f.end_frame()
    f.close()
    doc = read_gsd(p)
    assert doc["gsd_version"] == (1 << 16)
    assert len(doc["frames"]) == 2
    np.testing.assert_allclose(doc["frames"][0]["particles/position"], pos)
    assert doc["frames"][1]["configuration/step"][0] == 9


def test_cli_config1_end_to_end(tmp_path):
    """`metadyn run` on the Config-1 example: runs, writes hill log, CSV,
    and grid dump (BASELINE.json:7 anchor through the user-facing entry)."""
    from metadyn_tpu.cli import main
    import yaml
    cfg = yaml.safe_load(open("examples/config1_lj_lamellar.yaml"))
    cfg["run"]["n_steps"] = 100
    cfg["run"]["report_every"] = 50
    cfg["output"] = {
        "hill_file": str(tmp_path / "hills.txt"),
        "log_file": str(tmp_path / "log.csv"),
        "grid_file": str(tmp_path / "grid.npz"),
        "overwrite": True,
    }
    cfg_path = str(tmp_path / "c1.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    assert main(["run", cfg_path]) == 0
    from metadyn_tpu.io.hill_log import read_hills
    h = read_hills(str(tmp_path / "hills.txt"))
    assert h["step"].shape[0] == 4
    log = read_csv(str(tmp_path / "log.csv"))
    assert log["step"].shape[0] == 4
    from metadyn_tpu.io.grid_file import load_grid
    bias, meta = load_grid(str(tmp_path / "grid.npz"))
    assert meta["mode"] == "standard"
    assert np.asarray(bias.grid.V).max() > 0


def test_flux_checkpoint_bitwise_resume(tmp_path):
    """Flux-tempered histogram + bias state round-trips through the
    checkpoint: kill-and-resume reproduces the uninterrupted run
    bit-for-bit (VERDICT r1 item 5; SURVEY.md §3.4 saved/reset state)."""
    from metadyn_tpu.core.forcefield import ForceField
    from metadyn_tpu.cv.simple import AxisPosition
    from metadyn_tpu.flux_sampler import FluxTemperedSampler
    from metadyn_tpu.integrate.langevin import make_langevin_step

    def dw(pos, state, system):
        x = pos[0, 0]
        return 2.0 * (x * x - 1.0) ** 2 + 5.0 * (pos[0, 1] ** 2 + pos[0, 2] ** 2)

    def mk():
        system = make_system(1)
        ff = ForceField(external=dw)
        state = make_state(np.asarray([[1.0, 0, 0]], np.float32),
                           Box.cubic(50.0))
        return FluxTemperedSampler(
            system, state, ff.bind(system),
            cvs=[AxisPosition(0, 0, name="x")],
            grid_spec=GridSpec.create([-1.5], [1.5], [31], [0.1]),
            integrator_factory=lambda f: make_langevin_step(
                f, system, dt=0.005, kT=0.6, gamma=5.0),
            kT=0.6, stride=50, update_period=4, seed=2,
            min_round_trips=0)   # bitwise-cadence test: ungated

    ckpt = str(tmp_path / "flux_ckpt.npz")
    s1 = mk()
    s1.run(400)   # 2 update periods (bias rebuilt + histograms reset twice)
    save_checkpoint(ckpt, (s1.carry, s1.bias),
                    extra={"n_updates": s1.n_updates})
    s1.run(400)
    V_ref = np.asarray(s1.bias.grid.V)
    h_ref = np.asarray(s1.carry.flux.hist)

    s2 = mk()
    (carry, bias), extras = load_checkpoint(ckpt, (s2.carry, s2.bias))
    s2.carry, s2.bias = carry, bias
    s2.n_updates = int(extras["n_updates"])
    s2.run(400)
    np.testing.assert_array_equal(V_ref, np.asarray(s2.bias.grid.V))
    np.testing.assert_array_equal(h_ref, np.asarray(s2.carry.flux.hist))


def test_profiling_helpers(tmp_path):
    """StepTimer counters + named phases + trace capture (SURVEY.md §5
    tracing/profiling aux subsystem)."""
    from metadyn_tpu.utils.profiling import StepTimer, phase, trace
    s, system = _sampler()
    timer = StepTimer(n_particles=system.n)
    with trace(str(tmp_path / "tb")):
        s.run(250)
    rate = timer.lap(250)
    rep = timer.report()
    assert rep["steps"] == 250 and rate > 0
    assert rep["particle_steps_per_sec"] > 0
    import os
    assert any(os.scandir(tmp_path / "tb"))  # trace files written
    with phase("noop"):
        pass
