"""Trajectory writers — GSD-lite npz frames and real binary DCD.

Reference parity: HOOMD GSD/DCD dumps (SURVEY.md §2b/§5).  Two formats:

- npz (default): one file with stacked frames (positions, images, box,
  step); appending rewrites atomically (frames are small next to the MD
  state; for long production runs write multiple segment files).
- ``.dcd``: the CHARMM/NAMD binary format (Fortran-record layout, CHARMM
  version 24 with the unit-cell flag), so VMD / MDAnalysis / mdtraj read
  the output directly — genuine interop, not a lookalike.

``make_trajectory_writer`` picks by extension; both writers share the
``append(pos, image, box_L, step)`` interface the CLI uses.
"""
from __future__ import annotations

import os
import struct
import tempfile

import numpy as np


class TrajectoryWriter:
    def __init__(self, path: str, overwrite: bool = True):
        self.path = path
        self._frames: list[dict] = []
        if overwrite and os.path.exists(path):
            os.unlink(path)
        elif os.path.exists(path):
            old = read_trajectory(path)
            self._frames = [
                {k: old[k][i] for k in ("pos", "image", "box_L", "step")}
                for i in range(old["step"].shape[0])
            ]

    def append(self, pos, image, box_L, step: int) -> None:
        self._frames.append({
            "pos": np.asarray(pos, np.float32),
            "image": np.asarray(image, np.int32),
            "box_L": np.asarray(box_L, np.float32),
            "step": np.int64(step),
        })
        self._flush()

    def _flush(self) -> None:
        payload = {
            k: np.stack([f[k] for f in self._frames])
            for k in ("pos", "image", "box_L", "step")
        }
        dirname = os.path.dirname(os.path.abspath(self.path))
        fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez_compressed(f, **payload)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def read_trajectory(path: str) -> dict[str, np.ndarray]:
    z = np.load(path, allow_pickle=False)
    return {k: z[k] for k in z.files}


def _rec(payload: bytes) -> bytes:
    """One Fortran unformatted record: i32 length, payload, i32 length."""
    n = struct.pack("<i", len(payload))
    return n + payload + n


class DCDWriter:
    """CHARMM-format binary DCD (little-endian, 32-bit Fortran records).

    Header: 'CORD' + the 20-int icntrl block (frame count patched in place
    on every append, unit-cell flag set, CHARMM version 24), a title
    record, and the atom count.  Each frame: the XTLABC unit-cell record
    (6 f64: [A, cos γ, B, cos β, cos α, C] — zeros for orthorhombic) and
    one f32 record per coordinate axis.
    """

    _NSET_OFF = 8          # byte offset of NSET (icntrl[0]) inside the file
    _NSTEP_OFF = 20        # byte offset of NSTEP (icntrl[3])

    def __init__(self, path: str, overwrite: bool = True):
        self.path = path
        self.n_atoms: int | None = None
        self._n_frames = 0
        if not overwrite and os.path.exists(path):
            with open(path, "rb") as f:
                hdr = f.read(12)
                assert hdr[4:8] == b"CORD", f"{path} is not a DCD file"
                self._n_frames = struct.unpack("<i", hdr[8:12])[0]
                f.seek(0)
                d = read_dcd(path)
                self.n_atoms = d["pos"].shape[1]
            self._f = open(path, "r+b")
            self._f.seek(0, os.SEEK_END)
        else:
            self._f = open(path, "w+b")

    def _write_header(self, n_atoms: int, step: int) -> None:
        icntrl = [0] * 20
        icntrl[0] = 0              # NSET: patched per frame
        icntrl[1] = step           # ISTART
        icntrl[2] = 1              # NSAVC (frames are CLI-report spaced)
        icntrl[10] = 1             # unit-cell present
        icntrl[19] = 24            # CHARMM version
        self._f.write(_rec(b"CORD" + struct.pack("<20i", *icntrl)))
        title = b"Created by metadyn_tpu".ljust(80)[:80]
        self._f.write(_rec(struct.pack("<i", 1) + title))
        self._f.write(_rec(struct.pack("<i", n_atoms)))

    def append(self, pos, image, box_L, step: int) -> None:
        pos = np.asarray(pos, np.float32)
        if self.n_atoms is None:
            self.n_atoms = pos.shape[0]
            self._write_header(pos.shape[0], int(step))
        assert pos.shape[0] == self.n_atoms
        L = np.asarray(box_L, np.float64).reshape(-1)
        xtlabc = np.array([L[0], 0.0, L[1], 0.0, 0.0, L[2]], np.float64)
        self._f.write(_rec(xtlabc.tobytes()))
        for ax in range(3):
            self._f.write(_rec(np.ascontiguousarray(pos[:, ax]).tobytes()))
        self._n_frames += 1
        end = self._f.tell()
        self._f.seek(self._NSET_OFF)
        self._f.write(struct.pack("<i", self._n_frames))
        self._f.seek(self._NSTEP_OFF)
        self._f.write(struct.pack("<i", int(step)))
        self._f.seek(end)
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def read_dcd(path: str) -> dict[str, np.ndarray]:
    """Minimal DCD reader (for tests and round-trips): frames + box."""
    with open(path, "rb") as f:
        raw = f.read()

    off = 0

    def rec():
        nonlocal off
        (n,) = struct.unpack_from("<i", raw, off)
        payload = raw[off + 4 : off + 4 + n]
        (n2,) = struct.unpack_from("<i", raw, off + 4 + n)
        assert n == n2, "corrupt Fortran record"
        off += 8 + n
        return payload

    hdr = rec()
    assert hdr[:4] == b"CORD"
    icntrl = struct.unpack("<20i", hdr[4:84])
    nset, istart = icntrl[0], icntrl[1]
    rec()                                   # titles
    (n_atoms,) = struct.unpack("<i", rec())
    frames, boxes = [], []
    for _ in range(nset):
        xtl = np.frombuffer(rec(), np.float64)
        boxes.append([xtl[0], xtl[2], xtl[5]])
        xyz = [np.frombuffer(rec(), np.float32) for _ in range(3)]
        frames.append(np.stack(xyz, axis=1))
    return {
        "pos": np.stack(frames) if frames else np.zeros((0, n_atoms, 3)),
        "box_L": np.asarray(boxes, np.float64),
        "istart": np.int64(istart),
        "n_frames": np.int64(nset),
    }


def make_trajectory_writer(path: str, overwrite: bool = True):
    """Dispatch on extension: ``.gsd`` → HOOMD-schema GSD (native C++
    writer, io/gsd_file.py), ``.dcd`` → binary DCD, else npz frames."""
    if path.endswith(".gsd"):
        from .gsd_file import GSDWriter
        return GSDWriter(path, overwrite=overwrite)
    if path.endswith(".dcd"):
        return DCDWriter(path, overwrite=overwrite)
    return TrajectoryWriter(path, overwrite=overwrite)
