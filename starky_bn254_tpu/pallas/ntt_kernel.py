"""VMEM-resident four-step NTT as two Pallas TPU kernels.

The XLA radix-2^2 NTT (ntt.py) round-trips the whole array through HBM once
per fused stage pair (~10 materializations at 2^20 rows); the transform is
bandwidth-bound, so passes are the cost. Bailey's four-step factorization
n = n1*n2 needs only THREE passes:

  K1   x viewed [n1, n2*c]: a DIF NTT of length n1 over the leading axis,
       entirely in VMEM per (8,128)-tailed block (natural in, bit-reversed
       leading order out — no in-kernel permutations, every step is a
       leading-axis reshape/slice/concat, which Mosaic lowers for free).
  G    ONE row gather that simultaneously transposes [n1, n2] -> [n2, n1],
       un-bit-reverses K1's k1 axis, and BIT-REVERSES the j2 axis so K2 can
       run a plain DIT (bit-reversed in, natural out). All three
       permutations compose into a single precomputed index vector.
  K2   a DIT NTT of length n2 over the leading axis, with the inter-step
       "outer" twiddle w_n^{j2*k1} folded into its prologue (the per-block
       twiddle column is selected by the BlockSpec index map; the j2
       bit-reversal is pre-applied to the host table). The inverse
       transform's 1/n scale is folded into the outer table for free.

Output is the natural-order NTT, bit-identical to ntt.ntt(): all arithmetic
is exact mod p (u64 as u32 lo/hi pairs, u64ops mirrors goldilocks.py), and
an NTT's output values are algorithm-independent.

Reference analogue: the plonky2 fork's CPU fft lives in its external crate;
this file is the TPU-native replacement for the hot path (SURVEY.md §2b
"LDE/NTT", §7 hard part (a)).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import u64ops as u


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


# ---------------------------------------------------------------------------
# Host-side tables (exact Python ints, cached per size)
# ---------------------------------------------------------------------------


def _p() -> int:
    from .. import goldilocks as gl

    return gl.P


def _root(log_n: int, inverse: bool) -> int:
    from .. import goldilocks as gl

    r = gl.primitive_root_of_unity(log_n)
    return pow(r, gl.P - 2, gl.P) if inverse else r


@functools.lru_cache(maxsize=None)
def _bitrev(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int64)


@functools.lru_cache(maxsize=None)
def _stage_table(log_l: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """Per-stage butterfly twiddles for an in-VMEM length-2^log_l transform,
    packed so stage s (half-size m = 2^s) lives at offset m: table[m + j] =
    w_{2m}^j. One [L] array serves both the DIF and DIT ladders (they use
    identical stage tables). Returned as u32 (lo, hi) pairs."""
    p = _p()
    L = 1 << log_l
    root = _root(log_l, inverse)  # primitive L-th root
    tab = np.zeros(L, dtype=np.uint64)
    tab[0] = 1
    for s in range(log_l):
        m = 1 << s
        w = pow(root, L // (2 * m), p)
        acc = 1
        for j in range(m):
            tab[m + j] = acc
            acc = acc * w % p
    return (
        (tab & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (tab >> np.uint64(32)).astype(np.uint32),
    )


@functools.lru_cache(maxsize=None)
def _outer_table(ln1: int, ln2: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """w_n^{j2*k1} as [n1, n2] u32 pairs, with the j2 axis PRE-bit-reversed
    (K2's leading axis holds j2 in bitrev order) and, for the inverse
    transform, the global 1/n scale folded in."""
    p = _p()
    n1, n2 = 1 << ln1, 1 << ln2
    root = _root(ln1 + ln2, inverse)
    scale = pow(n1 * n2, p - 2, p) if inverse else 1
    brev2 = _bitrev(ln2)
    # row k1 of the [n1, n2] table: scale * (w^{k1})^{brev(pos)}
    tab = np.zeros((n1, n2), dtype=np.uint64)
    wk = 1
    for k1 in range(n1):
        acc = scale
        row = np.zeros(n2, dtype=np.uint64)
        for j2 in range(n2):
            row[j2] = acc
            acc = acc * wk % p
        tab[k1] = row[brev2]
        wk = wk * root % p
    # layout [n1, n2, 1, 1]: both index axes LEADING so a (1, n2, 1, 1)
    # block slice is tile-free; K2's index map picks the k1 row per program
    tab = tab.reshape(n1, n2, 1, 1)
    return (
        (tab & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (tab >> np.uint64(32)).astype(np.uint32),
    )


@functools.lru_cache(maxsize=None)
def _gather_perm(ln1: int, ln2: int) -> np.ndarray:
    """Row permutation composing transpose + k1-unbitrev + j2-bitrev:
    out[pos*n1 + k1] = in[brev1(k1)*n2 + brev2(pos)] over [n, c] rows."""
    n1, n2 = 1 << ln1, 1 << ln2
    brev1, brev2 = _bitrev(ln1), _bitrev(ln2)
    pos = np.arange(n2, dtype=np.int64)
    k1 = np.arange(n1, dtype=np.int64)
    perm = brev1[None, :] * n2 + brev2[pos][:, None]  # [n2, n1]
    assert perm.max() < (1 << 31)
    return perm.reshape(-1).astype(np.int32)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _dif_kernel(log_l: int, wlo_ref, whi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref):
    """Gentleman–Sande DIF over the leading axis: natural in, bitrev out."""
    L = 1 << log_l
    lo, hi = xlo_ref[:], xhi_ref[:]  # [L, 1, S, 128] (grid axis singleton)
    s_dim, lanes = lo.shape[2], lo.shape[3]
    lo = lo.reshape(L, s_dim, lanes)
    hi = hi.reshape(L, s_dim, lanes)
    wlo, whi = wlo_ref[:], whi_ref[:]  # [L, 1, 1]
    for s in range(log_l - 1, -1, -1):
        m = 1 << s
        k = L // (2 * m)
        vlo = lo.reshape(k, 2, m, s_dim, lanes)
        vhi = hi.reshape(k, 2, m, s_dim, lanes)
        alo, blo = vlo[:, 0], vlo[:, 1]
        ahi, bhi = vhi[:, 0], vhi[:, 1]
        slo, shi = u.addmod(alo, ahi, blo, bhi)
        dlo, dhi = u.submod(alo, ahi, blo, bhi)
        twl = wlo[m : 2 * m].reshape(1, m, 1, 1)
        twh = whi[m : 2 * m].reshape(1, m, 1, 1)
        dlo, dhi = u.mulmod(dlo, dhi, twl, twh)
        lo = jnp.concatenate([slo[:, None], dlo[:, None]], axis=1).reshape(
            L, s_dim, lanes
        )
        hi = jnp.concatenate([shi[:, None], dhi[:, None]], axis=1).reshape(
            L, s_dim, lanes
        )
    olo_ref[:] = lo.reshape(L, 1, s_dim, lanes)
    ohi_ref[:] = hi.reshape(L, 1, s_dim, lanes)


def _dit_kernel(log_l: int, wlo_ref, whi_ref, tlo_ref, thi_ref,
                xlo_ref, xhi_ref, olo_ref, ohi_ref):
    """Cooley–Tukey DIT over the leading axis (bitrev in, natural out),
    with the outer four-step twiddle applied in the prologue."""
    L = 1 << log_l
    lo, hi = xlo_ref[:], xhi_ref[:]  # [L, 1, S, 128] (grid axis singleton)
    s_dim, lanes = lo.shape[2], lo.shape[3]
    lo = lo.reshape(L, s_dim, lanes)
    hi = hi.reshape(L, s_dim, lanes)
    otl = tlo_ref[:].reshape(L, 1, 1)  # [1, L, 1, 1] block -> [L, 1, 1]
    oth = thi_ref[:].reshape(L, 1, 1)
    lo, hi = u.mulmod(lo, hi, otl, oth)
    wlo, whi = wlo_ref[:], whi_ref[:]
    for s in range(log_l):
        m = 1 << s
        k = L // (2 * m)
        vlo = lo.reshape(k, 2, m, s_dim, lanes)
        vhi = hi.reshape(k, 2, m, s_dim, lanes)
        alo, blo = vlo[:, 0], vlo[:, 1]
        ahi, bhi = vhi[:, 0], vhi[:, 1]
        twl = wlo[m : 2 * m].reshape(1, m, 1, 1)
        twh = whi[m : 2 * m].reshape(1, m, 1, 1)
        blo, bhi = u.mulmod(blo, bhi, twl, twh)
        slo, shi = u.addmod(alo, ahi, blo, bhi)
        dlo, dhi = u.submod(alo, ahi, blo, bhi)
        lo = jnp.concatenate([slo[:, None], dlo[:, None]], axis=1).reshape(
            L, s_dim, lanes
        )
        hi = jnp.concatenate([shi[:, None], dhi[:, None]], axis=1).reshape(
            L, s_dim, lanes
        )
    olo_ref[:] = lo.reshape(L, 1, s_dim, lanes)
    ohi_ref[:] = hi.reshape(L, 1, s_dim, lanes)


def _sublanes(L: int) -> int:
    """Tail sublane count: L * S * 128 u32-pair elements must fit the VMEM
    working set (~3 live [L, S, 128] pair-buffers), so L*S <= budget.
    STARKY_NTT_SUBLANE_BUDGET tunes it (and lets tests force the multi-
    block-per-column K2 path at toy sizes)."""
    import os

    budget = int(os.environ.get("STARKY_NTT_SUBLANE_BUDGET", 4096))
    s = 8
    while s > 1 and L * s > budget:
        s //= 2
    return s


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


MAX_LOG_N = 22  # n1, n2 <= 2^11 each with S >= 2


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def ntt2d(x: jnp.ndarray, inverse: bool = False, interpret: bool = False):
    """NTT along axis 0 of a u64 [n, c] array, natural order in/out,
    bit-identical to ntt.ntt(). Requires c % 128 == 0, n a power of two in
    [2^6, 2^MAX_LOG_N]; the inverse includes the 1/n scale."""
    pl, pltpu = _pl()
    n, c = x.shape
    log_n = int(n).bit_length() - 1
    assert (1 << log_n) == n and 6 <= log_n <= MAX_LOG_N
    assert c % 128 == 0 and c > 0

    ln1 = log_n // 2
    ln2 = log_n - ln1
    n1, n2 = 1 << ln1, 1 << ln2

    xlo, xhi = u.split_u64(x)
    w1 = _stage_table(ln1, inverse)
    w2 = _stage_table(ln2, inverse)
    ot = _outer_table(ln1, ln2, inverse)
    perm = jnp.asarray(_gather_perm(ln1, ln2))

    s1 = _sublanes(n1)
    g1 = (n2 * c) // (s1 * 128)
    s2 = _sublanes(n2)
    while s2 > 1 and c % (s2 * 128):  # one k1 per tail block
        s2 //= 2
    g2 = (n1 * c) // (s2 * 128)
    blocks_per_col = c // (s2 * 128)  # K2 tail blocks per k1 row

    from jax._src import config as _jcfg

    vspec = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    # Mosaic's stack for the in-kernel butterfly ladder measures ~9 KB per
    # L*S lane-unit (34.8 MB at L*S=4096), far past the 16 MB default scoped
    # limit at prover shapes: raise the cap (v5e VMEM is 128 MB; blocks +
    # stack peak ~51 MB at the largest supported L*S).
    import os as _os

    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=int(_os.environ.get("STARKY_NTT_VMEM_LIMIT_MB", 100))
        * 1024
        * 1024
    )

    with _jcfg.enable_x64(False):
        # ---- K1: DIF of length n1 over the leading axis
        k1lo, k1hi = pl.pallas_call(
            functools.partial(_dif_kernel, ln1),
            grid=(g1,),
            in_specs=[
                vspec((n1, 1, 1), lambda i: (0, 0, 0)),
                vspec((n1, 1, 1), lambda i: (0, 0, 0)),
                vspec((n1, 1, s1, 128), lambda i: (0, i, 0, 0)),
                vspec((n1, 1, s1, 128), lambda i: (0, i, 0, 0)),
            ],
            out_specs=(
                vspec((n1, 1, s1, 128), lambda i: (0, i, 0, 0)),
                vspec((n1, 1, s1, 128), lambda i: (0, i, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n1, g1, s1, 128), jnp.uint32),
                jax.ShapeDtypeStruct((n1, g1, s1, 128), jnp.uint32),
            ),
            compiler_params=None if interpret else cparams,
            interpret=interpret,
        )(
            jnp.asarray(w1[0]).reshape(n1, 1, 1),
            jnp.asarray(w1[1]).reshape(n1, 1, 1),
            xlo.reshape(n1, g1, s1, 128),
            xhi.reshape(n1, g1, s1, 128),
        )

        # ---- G: transpose + unbitrev(k1) + bitrev(j2), one row gather
        glo = jnp.take(k1lo.reshape(n, c), perm, axis=0)
        ghi = jnp.take(k1hi.reshape(n, c), perm, axis=0)

        # ---- K2: outer twiddle + DIT of length n2 over the leading axis
        def k1_of(i):
            return i // blocks_per_col

        outlo, outhi = pl.pallas_call(
            functools.partial(_dit_kernel, ln2),
            grid=(g2,),
            in_specs=[
                vspec((n2, 1, 1), lambda i: (0, 0, 0)),
                vspec((n2, 1, 1), lambda i: (0, 0, 0)),
                vspec((1, n2, 1, 1), lambda i: (k1_of(i), 0, 0, 0)),
                vspec((1, n2, 1, 1), lambda i: (k1_of(i), 0, 0, 0)),
                vspec((n2, 1, s2, 128), lambda i: (0, i, 0, 0)),
                vspec((n2, 1, s2, 128), lambda i: (0, i, 0, 0)),
            ],
            out_specs=(
                vspec((n2, 1, s2, 128), lambda i: (0, i, 0, 0)),
                vspec((n2, 1, s2, 128), lambda i: (0, i, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n2, g2, s2, 128), jnp.uint32),
                jax.ShapeDtypeStruct((n2, g2, s2, 128), jnp.uint32),
            ),
            compiler_params=None if interpret else cparams,
            interpret=interpret,
        )(
            jnp.asarray(w2[0]).reshape(n2, 1, 1),
            jnp.asarray(w2[1]).reshape(n2, 1, 1),
            jnp.asarray(ot[0]),
            jnp.asarray(ot[1]),
            glo.reshape(n2, g2, s2, 128),
            ghi.reshape(n2, g2, s2, 128),
        )

    return u.join_u64(outlo.reshape(n, c), outhi.reshape(n, c))


def available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


_SELF_TEST: dict[str, bool] = {}


def self_test_ok() -> bool:
    """One-time on-device smoke test (compile + run + compare vs XLA at a
    tiny shape). The kernels are pinned bit-identical in interpret mode on
    CPU, but Mosaic lowering only happens on real hardware — a lowering
    regression must DISABLE the pallas path, not kill a multi-hour prove."""
    if "ok" not in _SELF_TEST:
        import sys

        for attempt in range(2):  # one retry: transient tunnel/compile hiccups
            try:
                from .. import ntt

                rng = np.random.default_rng(0)
                x = jnp.asarray(
                    rng.integers(0, _p(), (1 << 6, 128), dtype=np.uint64)
                )
                got = np.asarray(ntt2d(x, inverse=False))
                want = np.asarray(ntt._ntt_xla(x, inverse=False))
                _SELF_TEST["ok"] = bool((got == want).all())
                if not _SELF_TEST["ok"]:  # mismatch won't fix itself: no retry
                    sys.stderr.write(
                        "starky: pallas NTT self-test MISMATCH; XLA path\n"
                    )
                    break
                break
            except Exception as e:  # pragma: no cover
                _SELF_TEST["ok"] = False
                sys.stderr.write(
                    f"starky: pallas NTT self-test error (attempt {attempt + 1}):"
                    f" {type(e).__name__}: {str(e)[:300]}\n"
                )
    return _SELF_TEST["ok"]
