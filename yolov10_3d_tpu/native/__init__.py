"""Native (C++) kernels, loaded via ctypes with compile-on-demand.

The reference ships numba-CUDA kernels for the KITTI evaluator's rotated IoU
(kitti_eval.py:19-345); here the host-side equivalent is a small C++ library
compiled once with g++. Falls back to the vectorized numpy implementation in
eval/kitti_eval.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libkitti_iou.so"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = _DIR / "kitti_iou.cc"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rotated_intersection_areas.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.rotated_iou.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, f32p]
    lib.iou_3d.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, f32p]
    _LIB = lib
    return lib


def rotated_iou(boxes1: np.ndarray, boxes2: np.ndarray, criterion: int = -1) -> Optional[np.ndarray]:
    """(N,5),(M,5) -> (N,M) rotated IoU, or None if the native lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.rotated_iou(b1, len(b1), b2, len(b2), criterion, out)
    return out


def iou_3d(g: np.ndarray, d: np.ndarray, criterion: int = -1) -> Optional[np.ndarray]:
    """(N,7),(M,7) camera-frame 3D IoU, or None if the native lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    g = np.ascontiguousarray(g, np.float32)
    d = np.ascontiguousarray(d, np.float32)
    out = np.empty((len(g), len(d)), np.float32)
    lib.iou_3d(g, len(g), d, len(d), criterion, out)
    return out


def build_pjrt_client(out_path: Optional[str] = None) -> Optional[str]:
    """Compile the C++ PJRT inference client (pjrt_client.cc) against the
    pjrt_c_api.h shipped in the tensorflow include tree. Returns the binary
    path, or None if no compiler/header is available."""
    import glob

    src = _DIR / "pjrt_client.cc"
    out = out_path or str(_DIR / "pjrt_client")
    includes = glob.glob(
        "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
    ) or glob.glob(str(Path(__file__).resolve().parents[2] / "third_party/xla"))
    if not includes:
        try:  # locate via the installed tensorflow package
            import tensorflow as tf

            includes = [str(Path(tf.__file__).parent / "include")]
        except ImportError:
            return None
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", f"-I{includes[0]}", str(src),
             "-ldl", "-o", out],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return out
    except (OSError, subprocess.SubprocessError):
        return None
