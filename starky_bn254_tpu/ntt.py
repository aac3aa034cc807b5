"""Number-theoretic transform and low-degree extension over Goldilocks.

The reference's polynomial/LDE machinery lives in the external plonky2 crate
(`PolynomialValues::new(column)` at the end of every trace generator, e.g.
reference src/fields/fq/exp.rs:274-277; LDE happens inside starky's prover).
Here it is built TPU-first:

* Iterative radix-2 decimation-in-time NTT: one bit-reversal row gather
  (precomputed index constant), then log2(n) stages of reshaped broadcasted
  butterflies over `[blocks, 2, half, cols]` views, which XLA maps cleanly
  onto the VPU. The stage loop is a Python loop over static stages, unrolled
  at trace time.
* All transforms are batched over a trailing column axis: the trace is
  `[rows, cols]` and one call transforms every column.
* Coset LDE: evaluate on `shift * <w_{n*blowup}>` so the vanishing polynomial
  Z_H(x) = x^n - 1 is nonzero everywhere on the evaluation domain.

Twiddle factors are precomputed with exact Python ints and cached per size.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Twiddles for each Stockham stage of a size-2^log_n NTT.

    Stage s (s = 0..log_n-1) operates on blocks of stride m = 2^s and needs
    the m distinct twiddles w_{2m}^j, j in [0, m) where w_{2m} is a primitive
    (2m)-th root (inverse root for the inverse transform).
    """
    n = 1 << log_n
    root = gl.primitive_root_of_unity(log_n)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)
    out = []
    for s in range(log_n):
        m = 1 << s
        w = pow(root, n // (2 * m), gl.P)  # primitive (2m)-th root
        tw = np.empty(m, dtype=np.uint64)
        acc = 1
        for j in range(m):
            tw[j] = acc
            acc = acc * w % gl.P
        out.append(tw)
    return tuple(out)


import functools as _functools

import jax as _jax


def ntt(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Forward/inverse NTT along axis 0 of `values` ([n] or [n, cols] u64).

    Natural order in, natural order out. The inverse includes the 1/n scaling.
    On TPU, large transforms run as the two-kernel Pallas four-step
    (pallas/ntt_kernel.py, 3 HBM passes instead of ~log(n)/2); results are
    bit-identical (an NTT's outputs are algorithm-independent; pinned by
    tests/test_pallas_kernels.py)."""
    import os

    if (
        values.ndim == 2
        and values.shape[0] >= (1 << 14)
        and values.shape[0].bit_length() - 1 <= 22
        and values.shape[1] >= 64
        # tall-and-narrow is XLA's: at [2^20, 120] the measured Pallas call
        # is 0.5x XLA (kernel roofline table, BASELINE.md round 4) and the
        # Mosaic compile of that shape spills registers (remote-compile
        # HTTP 500, queue_kernels.log); the prove-path commit shapes
        # (>= ~390 cols) stay on the kernel
        and not (values.shape[0] >= (1 << 20) and values.shape[1] < 256)
        and not os.environ.get("STARKY_NO_PALLAS")
        and not os.environ.get("STARKY_NO_PALLAS_NTT")
    ):
        from . import pallas as _pallas

        if _pallas.xla_only_active():
            return _ntt_xla(values, inverse)
        from .pallas import ntt_kernel as _nk

        if _nk.available() and _nk.self_test_ok():
            n, cols = values.shape
            pad = (-cols) % 128
            if pad:
                values = jnp.pad(values, ((0, 0), (0, pad)))
            out = _nk.ntt2d(values, inverse=inverse)
            return out[:, :cols] if pad else out
    return _ntt_xla(values, inverse)


@_functools.partial(_jax.jit, static_argnames=("inverse",))
def _ntt_xla(values: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    n, cols = values.shape
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"

    twiddles = _stage_twiddles(log_n, inverse)

    x = values[jnp.asarray(_bit_reversal(log_n))]
    s = 0
    if log_n % 2:  # odd stage count: one radix-2 stage, then radix-4 pairs
        xv = x.reshape(n // 2, 2, 1, cols)
        a, b = xv[:, 0], xv[:, 1]
        x = jnp.concatenate(
            [gl.add(a, b)[:, None], gl.sub(a, b)[:, None]], axis=1
        ).reshape(n, cols)
        s = 1
    # Radix-2^2: two DIT stages per materialization. Each XLA stage is an
    # HBM round-trip of the whole array (the inter-stage reshape/concat
    # breaks elementwise fusion), so fusing stage pairs halves NTT memory
    # traffic — the transform is bandwidth-bound. The arithmetic is the
    # exact same butterfly sequence (mod-p ops are exact), so outputs are
    # bit-identical to the radix-2 ladder.
    while s < log_n:
        m = 1 << s  # half-size of the FIRST of the two fused stages
        k = n // (4 * m)
        xv = x.reshape(k, 4, m, cols)
        a, b, c, d = xv[:, 0], xv[:, 1], xv[:, 2], xv[:, 3]
        w1 = jnp.asarray(twiddles[s], dtype=jnp.uint64)[None, :, None]  # [m]
        bw = gl.mul(b, w1)
        dw = gl.mul(d, w1)
        t0, t1 = gl.add(a, bw), gl.sub(a, bw)
        t2, t3 = gl.add(c, dw), gl.sub(c, dw)
        w2 = twiddles[s + 1]  # [2m]: second-stage twiddles
        w2a = jnp.asarray(w2[:m], dtype=jnp.uint64)[None, :, None]
        w2b = jnp.asarray(w2[m:], dtype=jnp.uint64)[None, :, None]
        t2w = gl.mul(t2, w2a)
        t3w = gl.mul(t3, w2b)
        x = jnp.concatenate(
            [
                gl.add(t0, t2w)[:, None],
                gl.add(t1, t3w)[:, None],
                gl.sub(t0, t2w)[:, None],
                gl.sub(t1, t3w)[:, None],
            ],
            axis=1,
        ).reshape(n, cols)
        s += 2
    if inverse:
        n_inv = jnp.asarray(np.uint64(pow(n, gl.P - 2, gl.P)))
        x = gl.mul(x, n_inv)
    return x[:, 0] if squeeze else x


@functools.lru_cache(maxsize=None)
def _bit_reversal(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


import jax as _jax


@_functools.partial(_jax.jit, static_argnames=("rate_bits", "shift"))
def _lde_scale_pad(
    coeffs: jnp.ndarray, rate_bits: int, shift: int
) -> jnp.ndarray:
    """Shift-scale coefficients and zero-pad to the LDE length (the part of
    lde_from_coeffs that is safe to jit-cache: the NTT itself dispatches
    OUTSIDE any jit so the Pallas-vs-XLA choice is made per call, never
    baked into a cached trace — ADVICE r3)."""
    n, cols = coeffs.shape
    big_n = n << rate_bits
    powers = _shift_powers(shift, n)
    scaled = gl.mul(coeffs, jnp.asarray(powers)[:, None])
    return jnp.zeros((big_n, cols), dtype=jnp.uint64).at[:n].set(scaled)


def lde_from_coeffs(
    coeffs: jnp.ndarray, rate_bits: int, shift: int = gl.GENERATOR
) -> jnp.ndarray:
    """Evaluate coefficient-form polynomials on shift * H_{n * 2^rate_bits}.

    coeffs: [n, cols]; returns [n << rate_bits, cols].
    """
    squeeze = coeffs.ndim == 1
    if squeeze:
        coeffs = coeffs[:, None]
    if isinstance(coeffs, _jax.core.Tracer):
        # called inside someone else's trace (e.g. a shard_map body): keep
        # everything in that trace; ntt() sees the tracer and its guards
        # (xla_only) decide the engine at the caller's trace time.
        out = ntt(
            _lde_scale_pad_traced(coeffs, rate_bits, shift), inverse=False
        )
    else:
        out = ntt(_lde_scale_pad(coeffs, rate_bits, shift), inverse=False)
    return out[:, 0] if squeeze else out


def _lde_scale_pad_traced(coeffs, rate_bits: int, shift: int):
    n, cols = coeffs.shape
    big_n = n << rate_bits
    powers = _shift_powers(shift, n)
    scaled = gl.mul(coeffs, jnp.asarray(powers)[:, None])
    return jnp.zeros((big_n, cols), dtype=jnp.uint64).at[:n].set(scaled)


@functools.lru_cache(maxsize=None)
def _shift_powers(shift: int, n: int) -> np.ndarray:
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = acc * shift % gl.P
    return powers


def interpolate_coset(values: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Coefficients of the polynomial with the given evals on shift * H_n."""
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    n = values.shape[0]
    coeffs = ntt(values, inverse=True)
    s_inv = pow(shift, gl.P - 2, gl.P)
    out = gl.mul(coeffs, jnp.asarray(_shift_powers(s_inv, n))[:, None])
    return out[:, 0] if squeeze else out


@_jax.jit
def eval_polys_at_ext_point(coeffs: jnp.ndarray, point_ext) -> jnp.ndarray:
    """Evaluate base-coeff polynomials at one extension point.

    coeffs: [n, cols]; point_ext: [2]. Returns [cols, 2]. Uses the powers
    vector + modular matvec rather than a sequential Horner scan (TPU-friendly
    log-depth scan + one reduction).
    """
    squeeze = coeffs.ndim == 1
    if squeeze:
        coeffs = coeffs[:, None]
    n, cols = coeffs.shape
    w = gl.ext_powers_vec(point_ext, n)  # [n, 2]
    c0 = gl.sum_mod(gl.mul(coeffs, w[:, 0:1]), axis=0)  # [cols]
    c1 = gl.sum_mod(gl.mul(coeffs, w[:, 1:2]), axis=0)
    out = jnp.stack([c0, c1], axis=-1)
    return out[0] if squeeze else out


@_jax.jit
def _eval_from_lde_impl(lde, w, factor_arr):
    """sum_i lde[i, :] * w[i] (ext weights), scaled by the ext factor."""
    r0 = gl.sum_mod(gl.mul(lde, w[:, 0:1]), axis=0)  # [cols]
    r1 = gl.sum_mod(gl.mul(lde, w[:, 1:2]), axis=0)
    s = jnp.stack([r0, r1], axis=-1)  # [cols, 2]
    return gl.ext_mul(s, jnp.broadcast_to(factor_arr, s.shape))


@_jax.jit
def _bary_weights(inv_den, xs):
    """x_i / (zeta - x_i) as ext weights [N, 2]."""
    return gl.ext_scalar_mul(inv_den, xs)


def _ext_pow_host(a: tuple[int, int], e: int) -> tuple[int, int]:
    """(a0 + a1*X)^e in GF(p^2) = GF(p)[X]/(X^2 - W), exact host ints."""
    r0, r1 = 1, 0
    b0, b1 = a[0] % gl.P, a[1] % gl.P
    while e > 0:
        if e & 1:
            r0, r1 = (
                (r0 * b0 + gl.W * r1 * b1) % gl.P,
                (r0 * b1 + r1 * b0) % gl.P,
            )
        e >>= 1
        if e:
            b0, b1 = (b0 * b0 + gl.W * b1 * b1) % gl.P, 2 * b0 * b1 % gl.P
    return r0, r1


def eval_from_lde(
    lde: jnp.ndarray,
    point: tuple[int, int],
    inv_den: jnp.ndarray,
    shift: int = gl.GENERATOR,
) -> jnp.ndarray:
    """Evaluate committed polynomials at an extension point FROM their LDE.

    Barycentric form over the coset D = shift * H_N (any poly of degree < N):
        p(zeta) = (zeta^N - s^N) / (N * s^N) * sum_i v_i * x_i / (zeta - x_i)
    using Z_D(X) = X^N - s^N and Z_D'(x_i) = N * s^N / x_i. `inv_den` is the
    precomputed 1/(x_i - zeta) [N, 2] — the SAME vector the batched-opening
    combine uses (its sign convention; the global -1 folds into the host
    factor) — so openings cost two matvecs and commitments don't have to
    retain coefficient arrays (3.4 GB per commitment at the 2^20-row G1
    target; dropping them is what fits the proof in one chip's HBM).

    lde: [N, cols] base-field values on D. Returns [cols, 2].
    """
    big_n = lde.shape[0]
    s_n = pow(shift, big_n, gl.P)
    p_n = _ext_pow_host(point, big_n)  # zeta^N
    z_d = ((p_n[0] - s_n) % gl.P, p_n[1])
    denom_inv = pow(big_n % gl.P * s_n % gl.P, gl.P - 2, gl.P)
    # inv_den is 1/(x_i - zeta): fold the barycentric sum's -1 in here
    factor = (
        (gl.P - z_d[0] * denom_inv % gl.P) % gl.P,
        (gl.P - z_d[1] * denom_inv % gl.P) % gl.P,
    )
    factor_arr = jnp.asarray(np.array(factor, dtype=np.uint64))
    xs = jnp.asarray(_coset_points(shift, big_n))
    w = _bary_weights(inv_den, xs)
    # column-chunked: one [N, C]-temp program at the 2^20 x 404 target
    # reserves multi-GB scratch; per-chunk results are per-column, so
    # chunking is trivially bit-identical.
    import os

    chunk = max(int(os.environ.get("STARKY_OPEN_CHUNK_CELLS", 1 << 27)) // big_n, 8)
    cols = lde.shape[1]
    if cols <= chunk:
        return _eval_from_lde_impl(lde, w, factor_arr)
    parts = []
    for c0 in range(0, cols, chunk):
        part = _eval_from_lde_impl(lde[:, c0 : c0 + chunk], w, factor_arr)
        from .xnp import hard_sync

        hard_sync(part)
        parts.append(part)
    return jnp.concatenate(parts, axis=0)


@functools.lru_cache(maxsize=None)
def _coset_points(shift: int, big_n: int) -> np.ndarray:
    """shift * omega^i over the size-big_n domain, natural order (host ints)."""
    w_big = gl.primitive_root_of_unity(big_n.bit_length() - 1)
    pts = np.empty(big_n, dtype=np.uint64)
    acc = shift % gl.P
    for i in range(big_n):
        pts[i] = acc
        acc = acc * w_big % gl.P
    return pts


def coset_lde(values: jnp.ndarray, rate_bits: int, shift: int = gl.GENERATOR):
    """Low-degree extension: interpolate columns over H_n, evaluate over
    shift * H_{n * 2^rate_bits}.

    values: [n, cols] evaluations over the size-n subgroup (natural order).
    Returns [n * 2^rate_bits, cols] evaluations over the shifted big domain.
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    n, cols = values.shape
    coeffs = ntt(values, inverse=True)
    big_n = n << rate_bits
    # scale coefficient i by shift^i, zero-pad to big_n, forward NTT
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        powers[i] = acc
        acc = acc * shift % gl.P
    scaled = gl.mul(coeffs, jnp.asarray(powers)[:, None])
    padded = jnp.zeros((big_n, cols), dtype=jnp.uint64).at[:n].set(scaled)
    out = ntt(padded, inverse=False)
    return out[:, 0] if squeeze else out


def interpolate_coeffs(values: jnp.ndarray) -> jnp.ndarray:
    """Monomial coefficients of the polynomial with the given subgroup evals."""
    return ntt(values, inverse=True)


def eval_poly_ext(coeffs: jnp.ndarray, point_ext: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial(s) with base-field coeffs at an extension point.

    coeffs: [n] or [n, cols]; point_ext: [2]. Returns [2] or [cols, 2].
    Horner in the extension field (scan-free; unrolled over log-chunks would
    be possible, but this runs on small n in the verifier only).
    """
    import jax

    squeeze = coeffs.ndim == 1
    if squeeze:
        coeffs = coeffs[:, None]
    n, cols = coeffs.shape

    def body(acc, c):
        # acc: [cols, 2]; c: [cols]
        acc = gl.ext_mul(acc, jnp.broadcast_to(point_ext, acc.shape))
        acc = gl.ext_add(acc, gl.ext_from_base(c))
        return acc, None

    init = jnp.zeros((cols, 2), dtype=jnp.uint64)
    acc, _ = jax.lax.scan(body, init, jnp.flip(coeffs, axis=0))
    return acc[0] if squeeze else acc
