"""ctypes bindings for the native witness generator (native/witness.cpp).

Loads native/libwitness.so if present (building it on first use when a
compiler is available); all callers fall back to the exact-int Python path
when the library is unavailable, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from . import goldilocks as gl
from .utils.conversions import N_LIMBS

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libwitness.so")
    if not os.path.exists(so):
        src = os.path.join(_NATIVE_DIR, "witness.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.batch_modular_witness.restype = ctypes.c_int64
    lib.batch_modular_witness.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ] + [ctypes.POINTER(ctypes.c_uint16)] * 5 + [ctypes.POINTER(ctypes.c_uint8)]
    lib.batch_fq_inv.restype = ctypes.c_int64
    lib.batch_fq_inv.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def batch_modular_witness(pol_inputs: np.ndarray, zero_op: bool):
    """pol_inputs: [n, 31] int64 (signed). Returns dict of numpy arrays:
    outputs [n,16], out_aux_red [n,16], quot_abs [n,17], aux_lo [n,31],
    aux_hi [n,31], signs [n] (canonical field values: 1 or p-1), all uint64.
    """
    lib = _load()
    assert lib is not None
    n = pol_inputs.shape[0]
    pol = np.ascontiguousarray(pol_inputs, dtype=np.int64)
    outputs = np.zeros((n, N_LIMBS), dtype=np.uint16)
    oar = np.zeros((n, N_LIMBS), dtype=np.uint16)
    qabs = np.zeros((n, N_LIMBS + 1), dtype=np.uint16)
    lo = np.zeros((n, 2 * N_LIMBS - 1), dtype=np.uint16)
    hi = np.zeros((n, 2 * N_LIMBS - 1), dtype=np.uint16)
    signs = np.zeros(n, dtype=np.uint8)
    rc = lib.batch_modular_witness(
        n,
        _ptr(pol, ctypes.c_int64),
        1 if zero_op else 0,
        _ptr(outputs, ctypes.c_uint16),
        _ptr(oar, ctypes.c_uint16),
        _ptr(qabs, ctypes.c_uint16),
        _ptr(lo, ctypes.c_uint16),
        _ptr(hi, ctypes.c_uint16),
        _ptr(signs, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"native modular witness failed at row {rc - 1}")
    sign_field = np.where(signs == 1, np.uint64(1), np.uint64(gl.P - 1))
    return {
        "outputs": outputs.astype(np.uint64),
        "out_aux_red": oar.astype(np.uint64),
        "quot_abs": qabs.astype(np.uint64),
        "aux_lo": lo.astype(np.uint64),
        "aux_hi": hi.astype(np.uint64),
        "signs": sign_field,
    }


def batch_fq_inv(limbs: np.ndarray) -> np.ndarray:
    """limbs: [n, 16] u16 values of nonzero Fq elements; returns inverses."""
    lib = _load()
    assert lib is not None
    n = limbs.shape[0]
    inp = np.ascontiguousarray(limbs, dtype=np.uint16)
    out = np.zeros((n, N_LIMBS), dtype=np.uint16)
    rc = lib.batch_fq_inv(n, _ptr(inp, ctypes.c_uint16), _ptr(out, ctypes.c_uint16))
    if rc != 0:
        raise ValueError(f"native fq inverse failed at row {rc - 1}")
    return out.astype(np.uint64)
