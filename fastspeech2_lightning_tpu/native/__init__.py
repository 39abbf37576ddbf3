"""Native C++ host kernels: build-on-first-use + ctypes bindings.

`b_mas_width1_native` and `yin_f0_native` mirror the NumPy golden
implementations (ops/mas.py, preprocessing/f0.py); `available()` reports
whether the shared library could be built. Compilation is cached next to the
source (kernels_<hash>.so) and falls back gracefully if no toolchain."""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "kernels.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    src = _SRC.read_text()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    out = _SRC.parent / f"kernels_{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        try:  # retry without -march=native / openmp for odd toolchains
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(out)],
                check=True, capture_output=True, timeout=120,
            )
            return out
        except Exception:
            return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.b_mas_width1.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.yin_f0.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.fs2t_native_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def b_mas_width1_native(
    log_attn: np.ndarray, in_lens: np.ndarray, out_lens: np.ndarray
) -> np.ndarray:
    """Batched width-1 MAS on the host. log_attn [B, T, L] float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native kernels unavailable (g++ build failed)")
    log_attn = np.ascontiguousarray(log_attn, dtype=np.float32)
    in_lens = np.ascontiguousarray(in_lens, dtype=np.int32)
    out_lens = np.ascontiguousarray(out_lens, dtype=np.int32)
    B, T, L = log_attn.shape
    out = np.zeros_like(log_attn)
    lib.b_mas_width1(
        log_attn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, T, L,
        in_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def yin_f0_native(
    audio: np.ndarray,
    sr: int,
    hop: int,
    n_frames: Optional[int] = None,
    f_min: float = 71.0,
    f_max: float = 800.0,
    threshold: float = 0.25,
) -> np.ndarray:
    """YIN F0 on the host (OpenMP over frames); 0 where unvoiced."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native kernels unavailable (g++ build failed)")
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if n_frames is None:
        n_frames = 1 + len(audio) // hop
    out = np.zeros(n_frames, dtype=np.float32)
    lib.yin_f0(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio), sr, hop, n_frames,
        np.float32(f_min), np.float32(f_max), np.float32(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
