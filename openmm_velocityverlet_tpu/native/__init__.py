"""Native (C) runtime components, loaded via ctypes with graceful fallback.

The reference keeps its IO/runtime layer in C++ (inside OpenMM); the TPU
rebuild keeps the compute path in XLA/Pallas and puts the IO hot paths here.
The library is compiled on first use with the system compiler and cached
next to the source; any failure falls back to the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_fastio.so")
_SRC = os.path.join(_HERE, "fastio.c")

_lib = None
_tried = False


def _build():
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Return the loaded native library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.parse_gro_block.restype = ctypes.c_long
        lib.parse_gro_block.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int)]
        lib.encode_dcd_frame.restype = ctypes.c_long
        lib.encode_dcd_frame.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_char_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def parse_gro_block(text: bytes, n_atoms: int):
    """Parse the coordinate block of a .gro file.

    Returns (positions (n,3) float64, velocities (n,3) float64 or None) or
    None when the native library is unavailable (caller falls back).
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    pos = np.empty((n_atoms, 3), np.float64)
    vel = np.zeros((n_atoms, 3), np.float64)
    has_vel = ctypes.c_int(0)
    got = lib.parse_gro_block(
        text, n_atoms,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(has_vel))
    if got != n_atoms:
        return None
    return pos, (vel if has_vel.value else None)


def encode_dcd_frame(xyz_nm, box_nm):
    """Encode one DCD frame natively.  Returns bytes or None (fallback)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz_nm, np.float32)
    box = np.ascontiguousarray(box_nm, np.float64)
    n = xyz.shape[0]
    buf = ctypes.create_string_buffer(56 + 3 * (4 * n + 8))
    got = lib.encode_dcd_frame(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        box.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), buf)
    return buf.raw[:got]
