"""GSD trajectory I/O: native C++ writer + pure-Python reader.

Reference parity: HOOMD-blue's primary trajectory/restart format is GSD
(``hoomd.dump.gsd``, via the glotzerlab ``gsd`` C library); the
metadynamics plugin's users dump and restart runs through it (SURVEY.md
§2b "GSD/DCD dump, snapshot restart" row).  This module provides

- :class:`GSDWriter` — writes HOOMD-schema (``schema="hoomd"``, 1.4)
  frames through the native C++ core (``_gsd.cpp``, ctypes-bound), using
  the GSD v1 file layout every release of the ``gsd`` reader understands;
- :func:`read_gsd` — an independent pure-Python (struct-based) reader for
  BOTH v1 and v2 layouts, used by the round-trip tests and to ingest
  externally produced HOOMD files as initial conditions.

The writer and reader are deliberately separate implementations of the
public spec (gsd.readthedocs.io, file layout): a bug in one cannot hide in
the other, which is what the round-trip test relies on.

The C++ core compiles on first use (g++ -O2 -shared, ~1 s) and is cached
next to the source; set ``METADYN_NO_NATIVE=1`` to skip the toolchain and
use the pure-Python fallback writer (same file layout, ~10x slower for
large frames).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile

import numpy as np

_HEADER = struct.Struct("<QQQQQII64s64s80s")
_ENTRY = struct.Struct("<QQqIHBB")
_MAGIC = 0x65DF65DF65DF65DF

# gsd type codes
_T_UINT8, _T_UINT16, _T_UINT32, _T_UINT64 = 1, 2, 3, 4
_T_INT8, _T_INT16, _T_INT32, _T_INT64 = 5, 6, 7, 8
_T_FLOAT, _T_DOUBLE = 9, 10
_DTYPES = {
    _T_UINT8: np.uint8, _T_UINT16: np.uint16, _T_UINT32: np.uint32,
    _T_UINT64: np.uint64, _T_INT8: np.int8, _T_INT16: np.int16,
    _T_INT32: np.int32, _T_INT64: np.int64, _T_FLOAT: np.float32,
    _T_DOUBLE: np.float64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


# --------------------------------------------------------------------------
# native library build + binding
# --------------------------------------------------------------------------

_lib_cache = None


def _build_native():
    """Compile _gsd.cpp into a cached shared object; returns its path or
    None when no toolchain is available."""
    src = os.path.join(os.path.dirname(__file__), "_gsd.cpp")
    out = os.path.join(os.path.dirname(__file__), "_gsd.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    with tempfile.NamedTemporaryFile(
            suffix=".so", dir=os.path.dirname(out), delete=False) as tmp:
        tmppath = tmp.name
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-D_FILE_OFFSET_BITS=64", src, "-o", tmppath]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmppath)
        except OSError:
            pass
        return None
    os.replace(tmppath, out)  # atomic: concurrent builders race safely
    return out


def _lib():
    global _lib_cache
    if _lib_cache is not None:
        return _lib_cache
    if os.environ.get("METADYN_NO_NATIVE"):
        _lib_cache = False
        return _lib_cache
    path = _build_native()
    if path is None:
        _lib_cache = False
        return _lib_cache
    lib = ctypes.CDLL(path)
    lib.metadyn_gsd_create.restype = ctypes.c_void_p
    lib.metadyn_gsd_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32]
    lib.metadyn_gsd_write_chunk.restype = ctypes.c_int
    lib.metadyn_gsd_write_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint8,
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_void_p]
    lib.metadyn_gsd_end_frame.restype = ctypes.c_int
    lib.metadyn_gsd_end_frame.argtypes = [ctypes.c_void_p]
    lib.metadyn_gsd_nframes.restype = ctypes.c_uint64
    lib.metadyn_gsd_nframes.argtypes = [ctypes.c_void_p]
    lib.metadyn_gsd_close.restype = ctypes.c_int
    lib.metadyn_gsd_close.argtypes = [ctypes.c_void_p]
    _lib_cache = lib
    return _lib_cache


class _NativeFile:
    """Thin RAII wrapper over the C++ core."""

    def __init__(self, path, application, schema, schema_version):
        lib = _lib()
        assert lib, "native gsd core unavailable"
        self._lib = lib
        self._h = lib.metadyn_gsd_create(
            path.encode(), application.encode(), schema.encode(),
            schema_version)
        if not self._h:
            raise OSError(f"cannot create gsd file {path!r}")

    def write_chunk(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        code = _CODES[arr.dtype]
        n = arr.shape[0] if arr.ndim else 1
        m = arr.shape[1] if arr.ndim == 2 else 1
        assert arr.ndim <= 2, "gsd chunks are at most 2-d"
        rc = self._lib.metadyn_gsd_write_chunk(
            self._h, name.encode(), code, n, m,
            arr.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise OSError(f"gsd chunk write failed: {name}")

    def end_frame(self) -> None:
        if self._lib.metadyn_gsd_end_frame(self._h) != 0:
            raise OSError("gsd end_frame failed")

    def close(self) -> None:
        if self._h:
            self._lib.metadyn_gsd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _PyFile:
    """Pure-Python fallback writing the identical v1 layout (used when no
    C++ toolchain exists; kept behaviorally in lockstep with _gsd.cpp and
    covered by the same round-trip tests)."""

    def __init__(self, path, application, schema, schema_version):
        self._f = open(path, "wb+")
        self._names: list[str] = []
        self._index: list[tuple] = []
        self._frame = 0
        self._app = application
        self._schema = schema
        self._sver = schema_version
        self._data_end = 256
        self._f.write(b"\0" * 256)
        self._flush()

    def _name_id(self, name: str) -> int:
        if name in self._names:
            return self._names.index(name)
        assert len(name) < 64
        self._names.append(name)
        return len(self._names) - 1

    def write_chunk(self, name: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        code = _CODES[arr.dtype]
        n = arr.shape[0] if arr.ndim else 1
        m = arr.shape[1] if arr.ndim == 2 else 1
        self._f.seek(self._data_end)
        raw = arr.tobytes()
        self._f.write(raw)
        self._index.append(
            (self._frame, n, self._data_end, m, self._name_id(name), code, 0))
        self._data_end += len(raw)

    def end_frame(self) -> None:
        self._frame += 1
        self._flush()

    def _flush(self) -> None:
        f = self._f
        index_loc = self._data_end
        f.seek(index_loc)
        for e in self._index:
            f.write(_ENTRY.pack(*e))
        f.write(b"\0" * _ENTRY.size)
        namelist_loc = index_loc + (len(self._index) + 1) * _ENTRY.size
        for nm in self._names:
            f.write(nm.encode().ljust(64, b"\0"))
        f.write(b"\0" * 64)
        f.seek(0)
        f.write(_HEADER.pack(
            _MAGIC, index_loc, len(self._index) + 1, namelist_loc,
            len(self._names) + 1, self._sver, (1 << 16) | 0,
            self._app.encode(), self._schema.encode(), b""))
        f.flush()

    def close(self) -> None:
        if self._f:
            self._flush()
            self._f.close()
            self._f = None


# --------------------------------------------------------------------------
# HOOMD-schema writer
# --------------------------------------------------------------------------


class GSDWriter:
    """HOOMD-schema GSD trajectory writer (drop-in third format next to
    the npz and DCD writers; picked by the ``.gsd`` extension).

    Frame 0 carries the full configuration (step, dimensions, box, N,
    typeid, types, position, image); subsequent frames write step, box,
    position and image — readers substitute frame-0 values for omitted
    chunks per the HOOMD schema's data-inheritance rule.
    """

    #: HOOMD schema version written ((major << 16) | minor)
    SCHEMA_VERSION = (1 << 16) | 4

    def __init__(self, path: str, overwrite: bool = True,
                 types: list[str] | None = None):
        old_frames = None
        if not overwrite and os.path.exists(path):
            # append-by-replay (the npz writer's resume semantics): reload
            # the committed frames and re-emit them into the fresh file
            old_frames = read_gsd(path)["frames"]
        cls = _NativeFile if _lib() else _PyFile
        self._file = cls(path, "metadyn_tpu", "hoomd", self.SCHEMA_VERSION)
        self._types = list(types) if types else ["A"]
        self._first = True
        if old_frames:
            for fr in old_frames:
                for name, arr in fr.items():
                    self._file.write_chunk(name, arr)
                self._file.end_frame()
            self._first = False

    def append(self, pos, image, box_L, step: int,
               typeid=None, velocity=None) -> None:
        pos = np.asarray(pos, np.float32)
        n = pos.shape[0]
        f = self._file
        f.write_chunk("configuration/step",
                      np.asarray([step], np.uint64))
        box = np.zeros(6, np.float32)
        box[:3] = np.asarray(box_L, np.float32)
        f.write_chunk("configuration/box", box)
        if self._first:
            f.write_chunk("configuration/dimensions",
                          np.asarray([3], np.uint8))
            f.write_chunk("particles/N", np.asarray([n], np.uint32))
            tid = (np.zeros(n, np.uint32) if typeid is None
                   else np.asarray(typeid, np.uint32))
            f.write_chunk("particles/typeid", tid)
            w = max(len(t) for t in self._types) + 1
            tarr = np.zeros((len(self._types), w), np.int8)
            for i, t in enumerate(self._types):
                b = t.encode()
                tarr[i, :len(b)] = np.frombuffer(b, np.int8)
            f.write_chunk("particles/types", tarr)
        f.write_chunk("particles/position", pos.reshape(n, 3))
        f.write_chunk("particles/image",
                      np.asarray(image, np.int32).reshape(n, 3))
        if velocity is not None:
            f.write_chunk("particles/velocity",
                          np.asarray(velocity, np.float32).reshape(n, 3))
        f.end_frame()
        self._first = False

    def close(self) -> None:
        self._file.close()


# --------------------------------------------------------------------------
# pure-Python reader (v1 + v2 layouts)
# --------------------------------------------------------------------------


def _read_names(data: bytes, version_major: int) -> list[str]:
    if version_major >= 2:
        # v2: densely packed NUL-terminated strings
        names = [s.decode() for s in data.split(b"\0") if s]
        return names
    names = []
    for off in range(0, len(data), 64):
        nm = data[off:off + 64].split(b"\0", 1)[0]
        if not nm:
            break
        names.append(nm.decode())
    return names


def read_gsd(path: str) -> dict:
    """Read a GSD file (v1 or v2 layout) into
    ``{"application", "schema", "schema_version", "frames": [dict, ...]}``
    where each frame maps chunk name -> ndarray.  HOOMD-schema frame-0
    inheritance is NOT applied — callers see exactly the stored chunks
    (:func:`read_gsd_frames` applies it)."""
    with open(path, "rb") as f:
        raw = f.read()
    (magic, index_loc, index_alloc, nm_loc, nm_alloc, schema_ver, gsd_ver,
     app, schema, _res) = _HEADER.unpack(raw[:_HEADER.size])
    if magic != _MAGIC:
        raise OSError(f"{path}: not a GSD file (bad magic)")
    vmaj = gsd_ver >> 16
    entries = []
    for i in range(index_alloc):
        off = index_loc + i * _ENTRY.size
        e = _ENTRY.unpack(raw[off:off + _ENTRY.size])
        if e[2] == 0:  # location == 0 terminates
            break
        entries.append(e)
    nm_bytes = nm_alloc * 64 if vmaj < 2 else nm_alloc * 64
    names = _read_names(raw[nm_loc:nm_loc + nm_bytes], vmaj)
    n_frames = max((e[0] for e in entries), default=-1) + 1
    frames: list[dict] = [dict() for _ in range(int(n_frames))]
    for frame, n, loc, m, nid, typ, _flags in entries:
        dt = np.dtype(_DTYPES[typ])
        nb = int(n) * int(m) * dt.itemsize
        arr = np.frombuffer(raw[loc:loc + nb], dt).reshape(int(n), int(m))
        if m == 1:
            arr = arr[:, 0]
        frames[int(frame)][names[nid]] = arr
    return {
        "application": app.split(b"\0", 1)[0].decode(),
        "schema": schema.split(b"\0", 1)[0].decode(),
        "schema_version": schema_ver,
        "gsd_version": gsd_ver,
        "frames": frames,
    }


def read_gsd_frames(path: str) -> list[dict]:
    """Frames with HOOMD-schema inheritance applied: chunks omitted from
    frame i > 0 fall back to their frame-0 value."""
    doc = read_gsd(path)
    frames = doc["frames"]
    if not frames:
        return frames
    base = frames[0]
    out = []
    for fr in frames:
        merged = dict(base)
        merged.update(fr)
        out.append(merged)
    return out


def gsd_types(frame: dict) -> list[str]:
    """Decode the particles/types int8 matrix into type-name strings."""
    tarr = np.asarray(frame["particles/types"], np.int8)
    return [bytes(row.tobytes()).split(b"\0", 1)[0].decode()
            for row in tarr]
