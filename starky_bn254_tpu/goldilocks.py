"""Goldilocks field arithmetic, vectorized over uint64 JAX arrays.

The reference build delegates Goldilocks arithmetic to the external plonky2
crate (reference: Cargo.toml:18-21; used everywhere, e.g.
src/modular/addcy.rs:13 hardcodes 2^-16 mod p). Here it is implemented from
scratch, array-first: every op maps elementwise over arbitrarily-shaped
uint64 arrays holding canonical values (< p), so the same code path runs
under jit/vmap/shard_map on TPU and CPU.

Representation choice: canonical u64 (requires jax_enable_x64). TPU has no
native 64-bit multiply; XLA decomposes u64 ops into u32 pairs. The hot muls
split operands into 32-bit halves explicitly so partial products stay exact,
then apply the branchless Goldilocks reduction 2^64 === 2^32 - 1 (mod p).

Extension field: GF(p^2) = GF(p)[X]/(X^2 - 7), represented as a trailing
dimension of size 2 (a[..., 0] + a[..., 1]*X). 7 is a quadratic non-residue
mod p (checked below at import).
"""

from __future__ import annotations

import functools

from . import xnp as jnp
import numpy as np

# ----------------------------------------------------------------------------
# Constants (computed with exact Python ints at import time)
# ----------------------------------------------------------------------------

P = (1 << 64) - (1 << 32) + 1  # Goldilocks prime
EPSILON = (1 << 32) - 1  # 2^64 mod p
W = 7  # quadratic extension non-residue: GF(p^2) = GF(p)[X]/(X^2 - W)
TWO_ADICITY = 32

# Multiplicative group order factors: p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
_FACTORS = [2, 3, 5, 17, 257, 65537]
assert functools.reduce(lambda a, b: a * b, _FACTORS) * 2**31 == P - 1

GENERATOR = 7
assert all(pow(GENERATOR, (P - 1) // q, P) != 1 for q in _FACTORS), (
    "7 must generate the multiplicative group"
)
# 7 is a non-residue since its order does not divide (p-1)/2.
assert pow(W, (P - 1) // 2, P) == P - 1

# 2^32-th primitive root of unity, and the tower of 2^k-th roots under it.
POWER_OF_TWO_GENERATOR = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)


def primitive_root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity as a Python int."""
    assert 0 <= log_n <= TWO_ADICITY
    return pow(POWER_OF_TWO_GENERATOR, 1 << (TWO_ADICITY - log_n), P)


_U64 = jnp.uint64
_MASK32 = np.uint64(0xFFFFFFFF)
_EPS = np.uint64(EPSILON)
_NP_P = np.uint64(P)


def u64(x) -> jnp.ndarray:
    """Lift Python ints / arrays to a canonical uint64 field array."""
    arr = np.asarray(x, dtype=np.object_)
    arr = np.vectorize(lambda v: int(v) % P, otypes=[np.uint64])(arr)
    return jnp.asarray(arr, dtype=_U64)


def to_int(x) -> np.ndarray:
    """Device array -> numpy uint64 (canonical values)."""
    return np.asarray(x, dtype=np.uint64)


# ----------------------------------------------------------------------------
# Base field ops (branchless, canonical in / canonical out)
# ----------------------------------------------------------------------------


def add(a, b):
    s = a + b  # wraps mod 2^64
    # a + b < 2p < 2^65: on wrap, true sum = s + 2^64 === s + EPSILON (mod p).
    over = s < a
    s = jnp.where(over, s + _EPS, s)
    # s + EPSILON cannot re-wrap into [p, 2^64) because s < EPSILON on wrap.
    return jnp.where(s >= _NP_P, s - _NP_P, s)


def sub(a, b):
    d = a - b
    under = a < b
    d = jnp.where(under, d - _EPS, d)
    return jnp.where(d >= _NP_P, d - _NP_P, d)


def neg(a):
    return jnp.where(a == 0, a, _NP_P - a)


def _reduce128(hi, lo):
    """Reduce hi*2^64 + lo (both u64) mod p, branchless.

    2^64 === 2^32 - 1, 2^96 === -1 (mod p). Split hi = hi_hi*2^32 + hi_lo:
      x === lo - hi_hi + hi_lo * (2^32 - 1)  (mod p)
    """
    hi_hi = hi >> np.uint64(32)
    hi_lo = hi & _MASK32

    # t0 = lo - hi_hi (mod p); hi_hi < 2^32 so a single EPSILON fix suffices.
    t0 = lo - hi_hi
    borrow = lo < hi_hi
    t0 = jnp.where(borrow, t0 - _EPS, t0)

    # t1 = hi_lo * (2^32 - 1) < 2^64 exactly (fits): hi_lo <= 2^32-1.
    t1 = hi_lo * _EPS

    # t0 + t1, with add's wrap fix, then canonicalize.
    s = t0 + t1
    over = s < t1
    s = jnp.where(over, s + _EPS, s)
    return jnp.where(s >= _NP_P, s - _NP_P, s)


def mul(a, b):
    """Full 64x64 -> 128-bit product via 32-bit halves, then reduce."""
    a_lo = a & _MASK32
    a_hi = a >> np.uint64(32)
    b_lo = b & _MASK32
    b_hi = b >> np.uint64(32)

    lo_lo = a_lo * b_lo
    hi_lo = a_hi * b_lo
    lo_hi = a_lo * b_hi
    hi_hi = a_hi * b_hi

    # mid accumulation: hi_lo + lo_hi may exceed 2^64.
    mid = hi_lo + (lo_lo >> np.uint64(32))  # <= (2^32-1)^2 + 2^32-1 < 2^64
    mid = mid + lo_hi
    mid_carry = mid < lo_hi  # wrapped?

    lo = (mid << np.uint64(32)) | (lo_lo & _MASK32)
    hi = hi_hi + (mid >> np.uint64(32)) + (mid_carry.astype(_U64) << np.uint64(32))
    return _reduce128(hi, lo)


def square(a):
    """a^2 mod p: the two cross products coincide, saving one of mul's four
    64-bit half-products (the Fermat inversion chain is ~75 squarings, the
    Poseidon S-box 2 of 4). Identical 128-bit product -> identical canonical
    residue."""
    a_lo = a & _MASK32
    a_hi = a >> np.uint64(32)

    lo_lo = a_lo * a_lo
    cross = a_hi * a_lo  # == lo_hi == hi_lo
    hi_hi = a_hi * a_hi

    mid = cross + (lo_lo >> np.uint64(32))  # < 2^64 (as in mul)
    mid = mid + cross
    mid_carry = mid < cross

    lo = (mid << np.uint64(32)) | (lo_lo & _MASK32)
    hi = hi_hi + (mid >> np.uint64(32)) + (mid_carry.astype(_U64) << np.uint64(32))
    return _reduce128(hi, lo)


def mul_const(a, c: int):
    """Multiply by a small Python-int constant (c < 2^32): cheap path."""
    assert 0 <= c < (1 << 32)
    cc = np.uint64(c)
    a_lo = a & _MASK32
    a_hi = a >> np.uint64(32)
    lo_prod = a_lo * cc  # < 2^64
    hi_prod = a_hi * cc  # < 2^64; contributes * 2^32
    mid = hi_prod + (lo_prod >> np.uint64(32))
    lo = (mid << np.uint64(32)) | (lo_prod & _MASK32)
    hi = mid >> np.uint64(32)
    return _reduce128(hi, lo)


def pow_const(a, e: int):
    """a^e for a fixed Python-int exponent (square-and-multiply, unrolled)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e > 0:
            base = square(base)
    if result is None:
        return jnp.ones_like(a)
    return result


import jax as _jax


def _sq_n(x, n: int):
    """x^(2^n) via a rolled loop of squarings (ONE squaring body in the
    executable instead of n copies — the unrolled ~126-op Fermat chain made
    every inversion-bearing program tens of MB, which dominates both remote
    compile time and the per-fresh-process executable transfer over the
    tunneled-TPU transport)."""
    return _jax.lax.fori_loop(0, n, lambda i, v: square(v), x)


def _inv_chain_rolled(a):
    """a^(p-2) by the 2^k-1 addition chain with rolled squaring runs.

    p-2 = (2^31-1)*2^33 + 2^32 - 1, and with f(k) = a^(2^k-1),
    f(k+m) = f(k)^(2^m) * f(m):  result = f(31)^(2^33) * f(32).
    ~75 squarings + 10 multiplies — fewer modmuls than binary
    square-and-multiply (~126) AND a tiny executable. The output is the
    canonical residue either way (exact arithmetic), so proofs/transcripts
    are unchanged."""
    f1 = a
    f2 = mul(_sq_n(f1, 1), f1)
    f3 = mul(_sq_n(f2, 1), f1)
    f4 = mul(_sq_n(f2, 2), f2)
    f7 = mul(_sq_n(f4, 3), f3)
    f8 = mul(_sq_n(f4, 4), f4)
    f15 = mul(_sq_n(f8, 7), f7)
    f16 = mul(_sq_n(f8, 8), f8)
    f31 = mul(_sq_n(f16, 15), f15)
    f32 = mul(_sq_n(f31, 1), f1)
    return mul(_sq_n(f31, 33), f32)


def inv(a):
    """Fermat inverse a^(p-2). inv(0) = 0.

    Under tracing: the rolled addition chain (small executable). On eager
    numpy inputs (host verifier paths): the unrolled square-and-multiply,
    which runs eagerly with no compilation at all. Identical values."""
    if isinstance(a, _jax.core.Tracer):
        return _inv_chain_rolled(a)
    return pow_const(a, P - 2)


@_jax.jit
def batch_inv(a):
    """Elementwise Fermat inversion (a^(p-2)); zeros map to zero (matching
    the pulse-witness convention, reference src/utils/pulse.rs:29-36).

    Deliberately NOT a Montgomery prefix-product trick: the associative
    scans it needs compile pathologically on the TPU AOT path and serialize
    the device, while ~85 fully-parallel squarings are cheap there.
    """
    return inv(a)


# ----------------------------------------------------------------------------
# Quadratic extension GF(p^2): arrays with trailing dim 2
# ----------------------------------------------------------------------------


def ext(c0, c1=None):
    c0 = jnp.asarray(c0, dtype=_U64)
    if c1 is None:
        c1 = jnp.zeros_like(c0)
    return jnp.stack([c0, c1], axis=-1)


def ext_add(a, b):
    return add(a, b)  # elementwise on trailing dim works as-is


def ext_sub(a, b):
    return sub(a, b)


def ext_neg(a):
    return neg(a)


def ext_mul(a, b):
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    t0 = mul(a0, b0)
    t1 = mul(a1, b1)
    c0 = add(t0, mul_const(t1, W))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return jnp.stack([c0, c1], axis=-1)


def ext_scalar_mul(a, s):
    """Multiply extension array by base-field array s (broadcast)."""
    return mul(a, s[..., None])


def ext_square(a):
    return ext_mul(a, a)


def ext_inv(a):
    # (a0 + a1 X)^-1 = (a0 - a1 X) / (a0^2 - W a1^2)
    a0, a1 = a[..., 0], a[..., 1]
    norm = sub(square(a0), mul_const(square(a1), W))
    ninv = inv(norm)
    return jnp.stack([mul(a0, ninv), mul(neg(a1), ninv)], axis=-1)


def ext_pow_const(a, e: int):
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e > 0:
            base = ext_square(base)
    if result is None:
        one = jnp.zeros_like(a)
        return jnp.at_set(one, (..., 0), 1)
    return result


def ext_from_base(a):
    """Embed base-field array as extension elements (trailing dim 2)."""
    return jnp.stack([a, jnp.zeros_like(a)], axis=-1)


# ----------------------------------------------------------------------------
# Reductions / scans
# ----------------------------------------------------------------------------


def sum_mod(x, axis: int):
    """Exact modular sum along an axis.

    Splits each canonical value into 32-bit halves so the plain integer sums
    are exact for up to 2^32 terms, then recombines mod p.
    """
    lo = jnp.sum(x & _MASK32, axis=axis)
    hi = jnp.sum(x >> np.uint64(32), axis=axis)
    # value = lo + hi * 2^32 = (hi >> 32) * 2^64 + ((hi << 32) + lo)
    lo2 = (hi << np.uint64(32)) + lo
    carry = lo2 < lo  # wrapped past 2^64
    hi2 = (hi >> np.uint64(32)) + carry.astype(_U64)
    return _reduce128(hi2, lo2)


def powers_vec(base, n: int):
    """[1, base, base^2, ..., base^{n-1}] for a scalar base (device array).

    Doubling construction (log n concats, no scans): A_{k+1} = A_k ++
    A_k * base^{2^k}."""
    base = jnp.asarray(base, dtype=_U64)
    out = jnp.ones((1,), dtype=_U64)
    step = base
    while out.shape[0] < n:
        out = jnp.concatenate([out, mul(out, step)])
        step = mul(step, step)
    return out[:n]


def cumprod(x):
    """Modular cumulative product along axis 0 (inclusive); Hillis-Steele
    doubling (log n shifted multiplies, no lax scans)."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad_shape = (d,) + x.shape[1:]
        shifted = jnp.concatenate(
            [jnp.ones(pad_shape, dtype=_U64), x[:-d]], axis=0
        )
        x = mul(x, shifted)
        d *= 2
    return x


def cumsum(x):
    """Modular cumulative sum along axis 0 (inclusive); Hillis-Steele
    doubling (log n shifted adds, no lax scans)."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad_shape = (d,) + x.shape[1:]
        shifted = jnp.concatenate(
            [jnp.zeros(pad_shape, dtype=_U64), x[:-d]], axis=0
        )
        x = add(x, shifted)
        d *= 2
    return x


def ext_powers_vec(base_ext, n: int):
    """[(1,0), b, b^2, ..., b^{n-1}] for an extension scalar b: [n, 2]
    (scan-free doubling construction)."""
    base = jnp.asarray(base_ext, dtype=_U64)
    out = jnp.at_set(jnp.zeros((1, 2), dtype=_U64), (0, 0), 1)
    step = base
    while out.shape[0] < n:
        out = jnp.concatenate([out, ext_mul(out, step[None, :])], axis=0)
        step = ext_mul(step, step)
    return out[:n]
