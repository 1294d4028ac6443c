"""ctypes loader for the native host kernels (build-on-demand, cached .so).

The reference vendors two native components (gymtorch C++ and the c_gae
Cython kernel — SURVEY.md §2 native census); their TPU-native equivalents
live here: a threaded GAE scan (host oracle + host pipelines) and threaded
motion preprocessing (FK + derivatives), both with numpy fallbacks so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "phc_native.cpp"
_LIB_PATH = _HERE / "libphc_native.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_LIB_PATH), str(_SRC), "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.phc_gae.argtypes = [f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
                            ctypes.c_float, ctypes.c_float, f32p]
    lib.phc_fk.argtypes = [f32p, f32p, i32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p]
    lib.phc_motion_derivatives.argtypes = [f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_float, f32p, f32p, f32p]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def available() -> bool:
    return load() is not None


def gae(dones: np.ndarray, values: np.ndarray, rewards: np.ndarray,
        gamma: float, lam: float) -> np.ndarray:
    """Reference-formula GAE over time-major (T, B) float32 arrays."""
    lib = load()
    dones = np.ascontiguousarray(dones, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    rewards = np.ascontiguousarray(rewards, np.float32)
    T, B = rewards.shape
    adv = np.zeros((T, B), np.float32)
    if lib is None:
        lastgaelam = np.zeros(B, np.float32)
        for t in range(T - 2, -1, -1):
            nonterminal = 1.0 - dones[t + 1]
            delta = rewards[t + 1] + gamma * values[t + 1] * nonterminal - values[t]
            lastgaelam = delta + gamma * lam * nonterminal * lastgaelam
            adv[t] = lastgaelam
        return adv
    lib.phc_gae(_ptr(dones), _ptr(values), _ptr(rewards), T, B,
                ctypes.c_float(gamma), ctypes.c_float(lam), _ptr(adv))
    return adv


def fk(local_rot: np.ndarray, trans: np.ndarray, parents: np.ndarray,
       local_t: np.ndarray):
    """Threaded FK over frames. Returns (grs (F,J,4), gts (F,J,3)) or None
    if the native lib is unavailable (caller falls back to numpy)."""
    lib = load()
    if lib is None:
        return None
    local_rot = np.ascontiguousarray(local_rot, np.float32)
    trans = np.ascontiguousarray(trans, np.float32)
    parents = np.ascontiguousarray(parents, np.int32)
    local_t = np.ascontiguousarray(local_t, np.float32)
    F, J = local_rot.shape[:2]
    grs = np.zeros((F, J, 4), np.float32)
    gts = np.zeros((F, J, 3), np.float32)
    lib.phc_fk(_ptr(local_rot), _ptr(trans), _iptr(parents), _ptr(local_t), F, J,
               _ptr(grs), _ptr(gts))
    return grs, gts


def motion_derivatives(gts: np.ndarray, grs: np.ndarray, lrs: np.ndarray, fps: float):
    """Threaded velocities for one clip. Returns (gvs, gavs, dvs) or None."""
    lib = load()
    if lib is None:
        return None
    gts = np.ascontiguousarray(gts, np.float32)
    grs = np.ascontiguousarray(grs, np.float32)
    lrs = np.ascontiguousarray(lrs, np.float32)
    F, J = gts.shape[:2]
    gvs = np.zeros((F, J, 3), np.float32)
    gavs = np.zeros((F, J, 3), np.float32)
    dvs = np.zeros((F, J - 1, 3), np.float32)
    lib.phc_motion_derivatives(_ptr(gts), _ptr(grs), _ptr(lrs), F, J,
                               ctypes.c_float(fps), _ptr(gvs), _ptr(gavs), _ptr(dvs))
    return gvs, gavs, dvs
