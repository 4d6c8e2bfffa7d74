"""Native (C) runtime components, built on demand and loaded via ctypes.

The reference's runtime is C++ end to end; in this engine the TPU compute
path is XLA/Pallas-compiled native code, and the host-side runtime pieces
that remain hot — currently the headless trace formatter — are C as well.
The shared library is compiled once with the system toolchain and cached.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "_native", "tracefmt.c")
_LIB = None
_TRIED = False


def _build_lib():
    src = os.path.abspath(_SRC)
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "AVBD3D_NATIVE_DIR", os.path.expanduser("~/.cache/avbd3d_tpu_native")
    )
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"tracefmt_{tag}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + ".tmp"
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src], check=True
        )
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.avbd_format_step.restype = ctypes.c_long
    lib.avbd_format_step.argtypes = [
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
    ]
    return lib


def get_tracefmt():
    """Returns the native library or None (toolchain unavailable)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_lib()
        except Exception:
            _LIB = None
    return _LIB


def format_step_native(step_idx: int, pos, quat, linvel, angvel, n_real: int):
    """Format the reference-compatible body dump; None if no native lib."""
    lib = get_tracefmt()
    if lib is None:
        return None

    def cptr(a):
        a = np.ascontiguousarray(a, dtype=np.float32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    pos, p_p = cptr(pos)
    quat, p_q = cptr(quat)
    linvel, p_l = cptr(linvel)
    angvel, p_a = cptr(angvel)
    # A dump line is ~155-170 bytes for typical large-scene values (13 %.4f
    # fields with signs and 2-digit integer parts); budget generously and
    # retry with a doubled buffer rather than silently falling back to the
    # slow Python formatter.
    cap = 256 * (n_real + 1) + 64
    for _ in range(3):
        buf = ctypes.create_string_buffer(cap)
        n = lib.avbd_format_step(step_idx, p_p, p_q, p_l, p_a, n_real, buf, cap)
        if n >= 0:
            return buf.raw[:n].decode()
        cap *= 2
    return None
