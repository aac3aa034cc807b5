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
    src = os.path.join(_NATIVE_DIR, "witness.cpp")
    stale = (
        os.path.exists(src)
        and os.path.exists(so)
        and os.path.getmtime(src) > os.path.getmtime(so)
    )
    if (not os.path.exists(so) or stale) and os.path.exists(src):
        try:
            tmp = so + ".build"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-pthread", "-o", tmp, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent readers see old or new
        except Exception:
            if not os.path.exists(so):
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
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    chain_sig = [
        ctypes.c_int64, ctypes.c_int64,   # n, rows
        u16p, u16p, u16p, u16p,           # ax0, ay0, bx0, by0
        u8p, u8p,                         # is_double, bits
        ctypes.POINTER(ctypes.c_uint64),  # main_out
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # stride, offs
        u16p, u16p,                       # final_bx, final_by
    ]
    for chain in ("g1_exp_chain", "g2_exp_chain"):
        if hasattr(lib, chain):  # older prebuilt .so may lack it
            fn = getattr(lib, chain)
            fn.restype = ctypes.c_int64
            fn.argtypes = chain_sig
    fq_sig = [
        ctypes.c_int64, ctypes.c_int64,   # n, rows
        u16p, u16p,                       # a0, b0
        u8p, u8p,                         # is_square, bits
        ctypes.POINTER(ctypes.c_uint64),  # main_out
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # stride, offs
        u16p,                             # final_b
    ]
    for chain in ("fq_exp_chain", "fq12_exp_chain"):
        if hasattr(lib, chain):
            fn = getattr(lib, chain)
            fn.restype = ctypes.c_int64
            fn.argtypes = fq_sig
    if hasattr(lib, "hist_u16_cols"):
        lib.hist_u16_cols.restype = ctypes.c_int64
        lib.hist_u16_cols.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
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


def has_g1_chain() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "g1_exp_chain")


def g1_exp_chain(
    ax: np.ndarray,  # [n, 16] u64 limbs
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    is_double: np.ndarray,  # [rows] bool/u8
    bits: np.ndarray,  # [n, rows] bool/u8
    main: np.ndarray,  # [n, rows, row_stride] u64 C-contiguous trace block
    coord_off: int,
    cells_off: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Runs the ENTIRE G1 double-and-add witness chain in C++, writing the
    per-row coordinates and G1Output cells straight into `main`. Returns
    (final_bx, final_by) u64 limb arrays (the proven outputs). One ctypes
    call replaces 512 x ~10 per-row Python/numpy/ctypes round trips."""
    lib = _load()
    assert lib is not None and hasattr(lib, "g1_exp_chain")
    n, rows, row_stride = main.shape
    assert main.flags.c_contiguous and main.dtype == np.uint64
    ax16 = np.ascontiguousarray(ax, dtype=np.uint16)
    ay16 = np.ascontiguousarray(ay, dtype=np.uint16)
    bx16 = np.ascontiguousarray(bx, dtype=np.uint16)
    by16 = np.ascontiguousarray(by, dtype=np.uint16)
    isd = np.ascontiguousarray(is_double, dtype=np.uint8)
    bts = np.ascontiguousarray(bits, dtype=np.uint8)
    fbx = np.zeros((n, N_LIMBS), dtype=np.uint16)
    fby = np.zeros((n, N_LIMBS), dtype=np.uint16)
    rc = lib.g1_exp_chain(
        n, rows,
        _ptr(ax16, ctypes.c_uint16), _ptr(ay16, ctypes.c_uint16),
        _ptr(bx16, ctypes.c_uint16), _ptr(by16, ctypes.c_uint16),
        _ptr(isd, ctypes.c_uint8), _ptr(bts, ctypes.c_uint8),
        _ptr(main, ctypes.c_uint64),
        row_stride, coord_off, cells_off,
        _ptr(fbx, ctypes.c_uint16), _ptr(fby, ctypes.c_uint16),
    )
    if rc != 0:
        raise ValueError(f"native g1 chain failed at (inst*rows+row)={rc - 1}")
    return fbx.astype(np.uint64), fby.astype(np.uint64)


def has_g2_chain() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "g2_exp_chain")


def g2_exp_chain(
    ax: np.ndarray,  # [n, 2, 16] u64 limbs (Fq2 component-major)
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    is_double: np.ndarray,  # [rows]
    bits: np.ndarray,  # [n, rows]
    main: np.ndarray,  # [n, rows, row_stride] u64 C-contiguous
    coord_off: int,
    cells_off: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Fq2 twin of g1_exp_chain: the whole G2 double-and-add witness chain
    in one call, coords (8x16 cells) + G2Output (640 cells) written straight
    into `main`. Returns (final_bx, final_by) as [n, 2, 16] u64 limbs."""
    lib = _load()
    assert lib is not None and hasattr(lib, "g2_exp_chain")
    n, rows, row_stride = main.shape
    assert main.flags.c_contiguous and main.dtype == np.uint64
    ax16 = np.ascontiguousarray(ax, dtype=np.uint16)
    ay16 = np.ascontiguousarray(ay, dtype=np.uint16)
    bx16 = np.ascontiguousarray(bx, dtype=np.uint16)
    by16 = np.ascontiguousarray(by, dtype=np.uint16)
    isd = np.ascontiguousarray(is_double, dtype=np.uint8)
    bts = np.ascontiguousarray(bits, dtype=np.uint8)
    fbx = np.zeros((n, 2, N_LIMBS), dtype=np.uint16)
    fby = np.zeros((n, 2, N_LIMBS), dtype=np.uint16)
    rc = lib.g2_exp_chain(
        n, rows,
        _ptr(ax16, ctypes.c_uint16), _ptr(ay16, ctypes.c_uint16),
        _ptr(bx16, ctypes.c_uint16), _ptr(by16, ctypes.c_uint16),
        _ptr(isd, ctypes.c_uint8), _ptr(bts, ctypes.c_uint8),
        _ptr(main, ctypes.c_uint64),
        row_stride, coord_off, cells_off,
        _ptr(fbx, ctypes.c_uint16), _ptr(fby, ctypes.c_uint16),
    )
    if rc != 0:
        raise ValueError(f"native g2 chain failed at (inst*rows+row)={rc - 1}")
    return fbx.astype(np.uint64), fby.astype(np.uint64)


def has_exp_chain(name: str) -> bool:
    """name: 'fq_exp_chain' | 'fq12_exp_chain'."""
    lib = _load()
    return lib is not None and hasattr(lib, name)


def exp_chain(
    name: str,  # 'fq_exp_chain' | 'fq12_exp_chain'
    a: np.ndarray,  # [n, 16] (fq) or [n, 12, 16] (fq12) u64 limbs
    b: np.ndarray,
    is_square: np.ndarray,  # [rows]
    bits: np.ndarray,  # [n, rows]
    main: np.ndarray,  # [n, rows, row_stride] u64 C-contiguous
    coord_off: int,
    cells_off: int,
) -> np.ndarray:
    """Runs an entire square-and-multiply witness chain (Fq or Fq12) in one
    C++ call, writing coords + output cells straight into `main`. Returns
    final_b (the proven outputs) with a's shape."""
    lib = _load()
    assert lib is not None and hasattr(lib, name)
    n, rows, row_stride = main.shape
    assert main.flags.c_contiguous and main.dtype == np.uint64
    a16 = np.ascontiguousarray(a, dtype=np.uint16)
    b16 = np.ascontiguousarray(b, dtype=np.uint16)
    isq = np.ascontiguousarray(is_square, dtype=np.uint8)
    bts = np.ascontiguousarray(bits, dtype=np.uint8)
    fb = np.zeros_like(b16)
    rc = getattr(lib, name)(
        n, rows,
        _ptr(a16, ctypes.c_uint16), _ptr(b16, ctypes.c_uint16),
        _ptr(isq, ctypes.c_uint8), _ptr(bts, ctypes.c_uint8),
        _ptr(main, ctypes.c_uint64),
        row_stride, coord_off, cells_off,
        _ptr(fb, ctypes.c_uint16),
    )
    if rc != 0:
        raise ValueError(f"native {name} failed at (inst*rows+row)={rc - 1}")
    return fb.astype(np.uint64)


def hist_u16_cols(view: np.ndarray, cols: np.ndarray) -> np.ndarray | None:
    """Counts of each u16 value across `view[:, cols]` (u64 cells < 2^16)
    without materializing the selected columns: view is a [n, C] u64 array
    (any row stride, unit column stride). Returns int64[65536], or None when
    the native library lacks the symbol. Raises on any cell >= 2^16."""
    lib = _load()
    if lib is None or not hasattr(lib, "hist_u16_cols"):
        return None
    assert view.dtype == np.uint64 and view.ndim == 2
    assert view.strides[1] == 8, "column stride must be one element"
    cols64 = np.ascontiguousarray(cols, dtype=np.int64)
    out = np.zeros(65536, dtype=np.int64)
    rc = lib.hist_u16_cols(
        view.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        view.shape[0],
        view.strides[0] // 8,
        _ptr(cols64, ctypes.c_int64),
        cols64.shape[0],
        _ptr(out, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError(
            f"hist_u16_cols: cell >= 2^16 at flat index {rc - 1}"
        )
    return out


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
