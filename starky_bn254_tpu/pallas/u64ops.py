"""Goldilocks arithmetic on explicit u32 (lo, hi) pairs.

The Mosaic/TPU backend has no 64-bit integer type, so Pallas kernels carry
every field element as two uint32 arrays. These helpers mirror
`goldilocks.py` op for op (same branchless reduction, same EPSILON fixups —
see goldilocks.py:80-143); both paths produce canonical residues (< p), so
results are bit-identical once repacked to u64.

All functions are plain jnp code on uint32 arrays: they trace inside Pallas
kernels, under jit, and run eagerly (numpy-compatible) for tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_MF = np.uint32(0xFFFFFFFF)
_1 = np.uint32(1)
_0 = np.uint32(0)

# p = 2^64 - 2^32 + 1 = (hi=0xFFFFFFFF, lo=0x00000001); EPSILON = 2^32 - 1.


def _b2u(x):
    # select, NOT astype: Mosaic lowers bool->u32 convert_element_type through
    # a recursive helper whose nesting (one level per convert in the kernel)
    # overflows CPython 3.12's fixed C-recursion guard on kernels this size.
    return jnp.where(x, _1, _0)


def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 -> (lo, hi, carry_out)."""
    lo = alo + blo
    c0 = _b2u(lo < alo)
    hi1 = ahi + bhi
    c1 = _b2u(hi1 < ahi)
    hi = hi1 + c0
    c2 = _b2u(hi < c0)  # hi1 + c0 wraps only if hi1 == 0xFFFFFFFF and c0 == 1
    return lo, hi, c1 | c2


def sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = _b2u(alo < blo)
    hi1 = ahi - bhi
    b1 = _b2u(ahi < bhi)
    hi = hi1 - b0
    b2 = _b2u(hi1 < b0)
    return lo, hi, b1 | b2


def _add_eps(lo, hi):
    """x + EPSILON (= 2^32 - 1) mod 2^64. Callers guarantee no 2^64 wrap."""
    lo2 = lo + _MF  # == lo - 1 mod 2^32; carries out unless lo == 0
    c = _b2u(lo != _0)
    return lo2, hi + c


def _sub_eps(lo, hi):
    """x - EPSILON mod 2^64."""
    lo2 = lo + _1  # lo - 0xFFFFFFFF == lo + 1 mod 2^32; borrows unless lo2 == 0
    b = _b2u(lo2 != _0)
    return lo2, hi - b


def _canon(lo, hi):
    """Conditional subtract p for a value in [0, 2^64): result < p.

    v >= p iff hi == 0xFFFFFFFF and lo >= 1. v - p == v + EPSILON mod 2^64.
    """
    ge = (hi == _MF) & (lo != _0)
    clo, chi = _add_eps(lo, hi)
    return jnp.where(ge, clo, lo), jnp.where(ge, chi, hi)


def addmod(alo, ahi, blo, bhi):
    """Canonical a + b mod p (mirrors goldilocks.add)."""
    lo, hi, over = add64(alo, ahi, blo, bhi)
    elo, ehi = _add_eps(lo, hi)
    o = over != _0
    lo = jnp.where(o, elo, lo)
    hi = jnp.where(o, ehi, hi)
    return _canon(lo, hi)


def submod(alo, ahi, blo, bhi):
    """Canonical a - b mod p (mirrors goldilocks.sub)."""
    lo, hi, under = sub64(alo, ahi, blo, bhi)
    elo, ehi = _sub_eps(lo, hi)
    u = under != _0
    lo = jnp.where(u, elo, lo)
    hi = jnp.where(u, ehi, hi)
    return _canon(lo, hi)


def mul32(a, b):
    """Full 32x32 -> 64-bit product of u32 arrays as (lo, hi) u32."""
    a0 = a & _M16
    a1 = a >> np.uint32(16)
    b0 = b & _M16
    b1 = b >> np.uint32(16)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    midc = _b2u(mid < lh)  # mid wrapped 2^32 (in units of 2^16)
    t = mid << np.uint32(16)
    lo = ll + t
    c2 = _b2u(lo < t)
    hi = hh + (mid >> np.uint32(16)) + (midc << np.uint32(16)) + c2
    return lo, hi


def sqr32(a):
    """Full 32-bit squaring: 3 16-bit multiplies instead of mul32's 4."""
    a0 = a & _M16
    a1 = a >> np.uint32(16)
    ll = a0 * a0
    lh = a0 * a1
    hh = a1 * a1
    mid = lh + lh  # 2*a0*a1, may wrap 2^32 (in units of 2^16)
    midc = _b2u(mid < lh)
    t = mid << np.uint32(16)
    lo = ll + t
    c2 = _b2u(lo < t)
    hi = hh + (mid >> np.uint32(16)) + (midc << np.uint32(16)) + c2
    return lo, hi


def sqr64_128(alo, ahi):
    """a^2 as four u32 limbs: 2 squarings + 1 doubled cross product
    (10 16-bit multiplies vs mul64_128's 16). Identical value."""
    llo, lhi = sqr32(alo)
    mlo, mhi = mul32(alo, ahi)
    hlo, hhi = sqr32(ahi)
    # double the cross term: d = 2*m (65-bit; top bit spills into r3)
    dlo = mlo << _1
    dhi = (mhi << _1) | (mlo >> np.uint32(31))
    dtop = mhi >> np.uint32(31)

    r0 = llo
    r1 = lhi + dlo
    c0 = _b2u(r1 < lhi)
    r2 = hlo + dhi
    c1 = _b2u(r2 < hlo)
    r2b = r2 + c0
    c2 = _b2u(r2b < c0)
    r3 = hhi + dtop + (c1 + c2)
    return r0, r1, r2b, r3


def sqrmod(alo, ahi):
    """Canonical a^2 mod p (bit-identical to mulmod(a, a))."""
    return reduce128(*sqr64_128(alo, ahi))


def mul64_128(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as four u32 limbs (r0..r3, LSW first)."""
    llo, lhi = mul32(alo, blo)
    m1lo, m1hi = mul32(alo, bhi)
    m2lo, m2hi = mul32(ahi, blo)
    hlo, hhi = mul32(ahi, bhi)

    r0 = llo
    # r1 = lhi + m1lo + m2lo, carries into r2
    r1 = lhi + m1lo
    c0 = _b2u(r1 < lhi)
    r1b = r1 + m2lo
    c1 = _b2u(r1b < m2lo)
    # r2 = hlo + m1hi + m2hi + carries, carries into r3
    r2 = hlo + m1hi
    d0 = _b2u(r2 < hlo)
    r2b = r2 + m2hi
    d1 = _b2u(r2b < m2hi)
    r2c = r2b + (c0 + c1)
    d2 = _b2u(r2c < r2b)
    r3 = hhi + (d0 + d1 + d2)
    return r0, r1b, r2c, r3


def reduce128(r0, r1, r2, r3):
    """r3..r0 (128-bit) mod p -> canonical (lo, hi). Mirrors
    goldilocks._reduce128: x === lo64 - hi_hi + hi_lo*(2^32-1) (mod p)."""
    # t0 = lo64 - hi_hi (hi_hi = r3 < 2^32)
    t0lo = r0 - r3
    bor0 = _b2u(r0 < r3)
    t0hi = r1 - bor0
    borrow = (r1 == _0) & (bor0 != _0)
    elo, ehi = _sub_eps(t0lo, t0hi)
    t0lo = jnp.where(borrow, elo, t0lo)
    t0hi = jnp.where(borrow, ehi, t0hi)

    # t1 = r2 * (2^32 - 1) = (r2 << 32) - r2, exact in 64 bits
    t1lo = _0 - r2
    t1hi = r2 - _b2u(r2 != _0)

    slo, shi, over = add64(t0lo, t0hi, t1lo, t1hi)
    plo, phi = _add_eps(slo, shi)
    o = over != _0
    slo = jnp.where(o, plo, slo)
    shi = jnp.where(o, phi, shi)
    return _canon(slo, shi)


def mulmod(alo, ahi, blo, bhi):
    """Canonical a * b mod p."""
    return reduce128(*mul64_128(alo, ahi, blo, bhi))


def sbox7(lo, hi):
    """x^7 (the Poseidon S-box): 2 squarings + 2 multiplies (squaring costs
    10 16-bit muls vs the general multiply's 16; values identical)."""
    x2 = sqrmod(lo, hi)
    x4 = sqrmod(*x2)
    x6 = mulmod(*x4, *x2)
    return mulmod(*x6, lo, hi)


# ---------------------------------------------------------------------------
# Host-side packing helpers (XLA ops, not kernel code)
# ---------------------------------------------------------------------------


def split_u64(x):
    """u64 array -> (lo, hi) u32 arrays (one fused XLA pass)."""
    lo = (x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> np.uint64(32)).astype(jnp.uint32)
    return lo, hi


def join_u64(lo, hi):
    """(lo, hi) u32 arrays -> u64 array."""
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))
