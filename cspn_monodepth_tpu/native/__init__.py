"""Native (C++) host-side kernels, loaded via ctypes.

The reference framework keeps its entire data path in Python (SURVEY.md
section 2: no native components).  On this framework's TPU hosts the
Python/numpy augmentation was the end-to-end bottleneck (~8 img/s per
core vs ~183 img/s consumed by one chip), so the hot host-side op — the
fused affine resample behind `data/transforms.py` — is implemented in
C++ (`augment.cpp`) and called through ctypes, which releases the GIL so
worker threads scale across host cores.

Build model: the shared library is compiled on demand with g++ (baked
into the image) and cached next to the package (or in a per-user temp
dir if the package is read-only), keyed by a hash of the source.  If no
compiler is available, callers fall back to the numpy implementation —
`lib()` returns None and everything still works.

Set CSPN_NATIVE=0 to disable the native path entirely.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "augment.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _source_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _so_path() -> str:
    name = f"_augment_{_source_hash()}.so"
    for base in (_DIR, os.path.join(tempfile.gettempdir(),
                                    f"cspn_native_{os.getuid()}")):
        try:
            os.makedirs(base, exist_ok=True)
            probe = os.path.join(base, ".w")
            with open(probe, "w"):
                pass
            os.remove(probe)
            return os.path.join(base, name)
        except OSError:
            continue
    return os.path.join(tempfile.gettempdir(), name)


def _build(so: str) -> bool:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return False
    tmp = so + f".tmp{os.getpid()}"
    cmd = [gxx, "-O3", "-std=c++17", "-shared", "-fPIC",
           "-fno-math-errno", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race safely
        return True
    except (subprocess.SubprocessError, OSError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    f32 = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    L, F = ctypes.c_long, ctypes.c_float
    lib.affine_bilinear_f32.argtypes = [f32, L, L, L, f32, f32, L, L,
                                        f32, F, F]
    lib.affine_bilinear_f32.restype = None
    lib.affine_bilinear_u8.argtypes = [u8, L, L, L, f32, f32, L, L,
                                       f32, F, F]
    lib.affine_bilinear_u8.restype = None
    lib.affine_nearest_f32.argtypes = [f32, L, L, f32, f32, L, L, F]
    lib.affine_nearest_f32.restype = None
    return lib


def lib() -> ctypes.CDLL | None:
    """The loaded native library, building it if needed; None if
    unavailable (no compiler) or disabled (CSPN_NATIVE=0)."""
    global _lib, _tried
    if os.environ.get("CSPN_NATIVE", "1") == "0":
        return None
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _so_path()
        if not os.path.exists(so) and not _build(so):
            return None
        try:
            _lib = _bind(ctypes.CDLL(so))
        except OSError:
            _lib = None
    return _lib
