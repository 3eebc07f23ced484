"""Trajectory writer — GSD-lite npz frames.

Reference parity: HOOMD GSD/DCD dumps (SURVEY.md §2b/§5).  One npz per
trajectory with stacked frames (positions, images, box, step); appending
rewrites atomically (frames are small next to the MD state; for long
production runs write multiple segment files).
"""
from __future__ import annotations

import os
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
