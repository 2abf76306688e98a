"""ctypes bindings + cache converter for the native C++ scene loader.

The reference's input pipeline is torch DataLoader with 8 pickle-parsing
worker subprocesses (utils.py:41-57).  The TPU build replaces it with:

  1. a one-time conversion of scene pickles to flat ``.rsc`` binaries
     (`convert_dataset`) — removes per-step pickle parsing entirely;
  2. a C++ thread-pool loader (native/loader.cc) that resamples, jitters
     and pads whole batches while the device steps (double-buffered).

Falls back transparently to the Python GraspDataset when the shared
library can't be built (`NativeLoader.available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from regnet_for_3d_grasping_tpu.data.dataset import (
    SceneBatch,
    load_scene,
    pad_gt_grasps,
)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librsc_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "loader.cc")


def build_library(force: bool = False) -> Optional[str]:
    """Compile native/loader.cc with g++ if needed; returns .so path."""
    if os.path.exists(_SO_PATH) and not force \
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
        return _SO_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC_PATH, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def scene_to_rsc(scene: dict, out_path: str):
    """Write one scene dict as a flat .rsc binary (unpadded GT arrays)."""
    view = np.ascontiguousarray(scene["view_cloud"], np.float32)
    color = np.ascontiguousarray(scene["view_cloud_color"], np.float32)
    score = np.ascontiguousarray(scene["view_cloud_score"], np.float32)
    label = np.ascontiguousarray(
        scene.get("view_cloud_label", np.zeros(len(view))), np.float32)
    g = _num_grasps(scene)
    frames, gscores, _ = pad_gt_grasps(scene, max_grasps=max(g, 1))
    with open(out_path, "wb") as f:
        f.write(b"RSC1")
        f.write(np.array([len(view), g], np.int32).tobytes())
        f.write(view.tobytes())
        f.write(color.tobytes())
        f.write(score.tobytes())
        f.write(label.tobytes())
        f.write(np.ascontiguousarray(frames[:g], np.float32).tobytes())
        f.write(np.ascontiguousarray(gscores[:g], np.float32).tobytes())


def _num_grasps(scene: dict) -> int:
    if "frame" in scene:
        return len(scene["frame"])
    if "select_frame" in scene:
        return len(scene["select_frame"])
    return 0


def convert_dataset(paths: List[str], cache_dir: str) -> List[str]:
    """Convert scene pickles to .rsc files (skips up-to-date ones)."""
    os.makedirs(cache_dir, exist_ok=True)
    out = []
    for p in paths:
        dst = os.path.join(
            cache_dir, os.path.basename(p).replace(".p", ".rsc"))
        if not os.path.exists(dst) \
                or os.path.getmtime(dst) < os.path.getmtime(p):
            scene_to_rsc(load_scene(p), dst)
        out.append(dst)
    return out


class NativeLoader:
    """Double-buffered native batch loader (SceneBatch-compatible)."""

    def __init__(self, rsc_paths: List[str], batch_size: int,
                 num_points: int, max_grasps: int, seed: int = 0,
                 n_threads: int = 8, augment: bool = True,
                 width: float = 0.08):
        so = build_library()
        if so is None:
            raise RuntimeError("native loader unavailable (g++ failed)")
        self._lib = ctypes.CDLL(so)
        self._lib.rsc_loader_create.restype = ctypes.c_void_p
        self._lib.rsc_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int]
        self._lib.rsc_loader_next.restype = ctypes.c_int
        self._lib.rsc_loader_next.argtypes = [ctypes.c_void_p] + \
            [np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
             for d in (np.float32, np.float32, np.float32, np.float32,
                       np.float32, np.uint8, np.int32)]
        self._lib.rsc_loader_destroy.argtypes = [ctypes.c_void_p]

        self.paths = rsc_paths
        self.batch_size = batch_size
        self.num_points = num_points
        self.max_grasps = max_grasps
        self.width = np.float32(width)

        arr = (ctypes.c_char_p * len(rsc_paths))(
            *[p.encode() for p in rsc_paths])
        self._handle = self._lib.rsc_loader_create(
            arr, len(rsc_paths), batch_size, num_points, max_grasps,
            seed, n_threads, int(augment))
        if not self._handle:
            raise RuntimeError("rsc_loader_create failed")

    def __len__(self):
        return len(self.paths)

    def next_batch(self) -> SceneBatch:
        B, N, MG = self.batch_size, self.num_points, self.max_grasps
        pc = np.empty((B, N, 6), np.float32)
        score = np.empty((B, N), np.float32)
        label = np.empty((B, N), np.float32)
        frames = np.empty((B, MG, 3, 4), np.float32)
        gscores = np.empty((B, MG, 3), np.float32)
        valid = np.empty((B, MG), np.uint8)
        ids = np.empty((B,), np.int32)
        rc = self._lib.rsc_loader_next(
            self._handle, pc, score, label,
            frames.reshape(B, MG, 12), gscores, valid, ids)
        if rc != 0:
            raise RuntimeError("rsc_loader_next failed")
        return SceneBatch(
            pc=pc, score=score, label=label, gt_frames=frames,
            gt_scores=gscores, gt_valid=valid.astype(bool),
            paths=[self.paths[i] for i in ids],
            width=np.full(B, self.width, np.float32))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.rsc_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
