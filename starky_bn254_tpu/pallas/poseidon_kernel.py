"""VMEM-resident Poseidon sponge absorption as a Pallas TPU kernel.

The XLA path (poseidon.sponge_absorb) emits one straight-line graph of
~30 rounds x ~650 u64 ops per permutation; XLA splits it into many fusions
whose intermediates round-trip HBM (measured 400 ms per [2^20]-row
permutation — ~14 GB of traffic). This kernel holds a row tile of the
sponge state (and the column block being absorbed) in VMEM through every
round of every chunk, so HBM sees each value exactly once.

Layouts: all arrays transposed to [lanes, n] so the long row axis rides the
128-wide vector lanes (the state's 12-wide axis sits on sublanes), and u64
is carried as explicit u32 (lo, hi) pairs (u64ops) because Mosaic has no
64-bit integers.

Bit-identity: same field ops, same round structure, same constants as
poseidon._permute_impl (both produce canonical residues), pinned by
tests/test_pallas_kernels.py against the XLA path.
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


@functools.lru_cache(maxsize=None)
def _mds_consts() -> tuple:
    """(row, diag, form) for the active parameter set. form is 'shift'
    (pow2 circulant, zero diag: terms are lane shifts) or 'mul16' (all
    entries < 2^16: terms are exact u32-half multiplies). Parameter sets
    with larger entries make the kernel unavailable (kernel_ok) and the
    XLA dense path runs instead."""
    from .. import poseidon

    return (
        tuple(poseidon.FAST_MDS_ROW),
        tuple(poseidon.MDS_DIAG),
        poseidon._mds_form(),
    )


def kernel_ok() -> bool:
    """True when the active Poseidon parameters are expressible in this
    kernel's exact shift/small-multiply MDS forms."""
    return _mds_consts()[2] in ("shift", "mul16")


@functools.lru_cache(maxsize=None)
def _rc_u32() -> tuple[np.ndarray, np.ndarray]:
    from .. import poseidon

    rc, _ = poseidon._constants()  # [30, 12] u64
    return (
        (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (rc >> np.uint64(32)).astype(np.uint32),
    )


def _mds(lo, hi):
    """MDS layer circ(row)+diag(diag) on [12, T] u32 pairs.

    out[i] = sum_d m_d * s[(i+d) % 12] (+ diag_i * s[i]): computed for all
    i at once by accumulating rotated-row copies, mirroring
    poseidon._mds_layer's exact u64 term-sum + single 128-bit reduction
    (term halves < 2^48, 13 terms -> sums < 2^53, exact). Terms are lane
    shifts for power-of-two rows ('shift' form) or u32-half multiplies for
    entries < 2^16 ('mul16' form — plonky2's circ+diag constants are < 2^6)."""
    row, diag, form = _mds_consts()

    def term(vlo, vhi, m: int):
        # (vlo, vhi as independent u32 lanes) * m -> 64-bit (t, carry) each.
        # All constants are SCALARS: pallas_call forbids captured array
        # constants, and numpy scalars fold into the kernel as literals.
        if m == 1:
            z = jnp.zeros_like(vlo)
            return vlo, z, vhi, z
        if form == "shift":
            e = int(m).bit_length() - 1
            sh, ish = np.uint32(e), np.uint32(32 - e)
            return vlo << sh, vlo >> ish, vhi << sh, vhi >> ish
        m32 = np.uint32(m)  # numpy scalar: broadcasts inside mul32's lanes
        tlo, tc = u.mul32(vlo, m32)
        ulo, uc = u.mul32(vhi, m32)
        return tlo, tc, ulo, uc

    blo = bhi = alo = ahi = None  # b: sum of term lo-halves; a: hi-halves
    for d, m in enumerate(row):
        rlo = jnp.concatenate([lo[d:], lo[:d]], axis=0) if d else lo
        rhi = jnp.concatenate([hi[d:], hi[:d]], axis=0) if d else hi
        if m == 0:
            continue
        tlo, tc, ulo, uc = term(rlo, rhi, m)
        if blo is None:
            blo, bhi, alo, ahi = tlo, tc, ulo, uc
        else:
            blo, bhi, _ = u.add64(blo, bhi, tlo, tc)
            alo, ahi, _ = u.add64(alo, ahi, ulo, uc)
    if any(diag):
        # diag contribution: diag_i * s[i] added to out[i]. Row-sliced with
        # SCALAR multipliers (a [12,1] constant array would be captured by
        # the kernel, which pallas_call rejects); zero-diag rows contribute
        # zeros so the concatenated shape stays [12, T].
        rows = []
        for i, dv in enumerate(diag):
            if dv:
                rows.append(term(lo[i : i + 1], hi[i : i + 1], dv))
            else:
                z = jnp.zeros_like(lo[i : i + 1])
                rows.append((z, z, z, z))
        dlo, dc, elo, ec = (
            jnp.concatenate([r[k] for r in rows], axis=0) for k in range(4)
        )
        blo, bhi, _ = u.add64(blo, bhi, dlo, dc)
        alo, ahi, _ = u.add64(alo, ahi, elo, ec)
    # v = (a << 32) + b, then reduce 128 -> canonical
    # r0 = b_lo; r1 = b_hi + a_lo (carry c); r2 = a_hi + c; r3 = 0
    r1 = bhi + alo
    c = (r1 < alo).astype(jnp.uint32)
    r2 = ahi + c
    return u.reduce128(blo, r1, r2, jnp.zeros_like(r2))


def _permute(state_lo, state_hi, rc_lo_ref, rc_hi_ref):
    """Full 30-round permutation on [12, T] u32 pairs; rc refs in SMEM."""
    from .. import poseidon

    half = poseidon.FULL_ROUNDS // 2
    partial = poseidon.PARTIAL_ROUNDS

    def rc_vec(r):
        lo = jnp.stack([rc_lo_ref[r, i] for i in range(12)])[:, None]
        hi = jnp.stack([rc_hi_ref[r, i] for i in range(12)])[:, None]
        return lo, hi

    def full_round(r, st):
        lo, hi = st
        clo, chi = rc_vec(r)
        lo, hi = u.addmod(lo, hi, clo, chi)
        lo, hi = u.sbox7(lo, hi)
        return _mds(lo, hi)

    def partial_round(r, st):
        lo, hi = st
        clo, chi = rc_vec(r)
        lo, hi = u.addmod(lo, hi, clo, chi)
        s0lo, s0hi = u.sbox7(lo[0:1], hi[0:1])
        lo = jnp.concatenate([s0lo, lo[1:]], axis=0)
        hi = jnp.concatenate([s0hi, hi[1:]], axis=0)
        return _mds(lo, hi)

    st = (state_lo, state_hi)
    st = jax.lax.fori_loop(0, half, full_round, st)
    st = jax.lax.fori_loop(half, half + partial, partial_round, st)
    st = jax.lax.fori_loop(half + partial, 2 * half + partial, full_round, st)
    return st


def _sponge_kernel(n_chunks: int, rate: int,
                   rc_lo_ref, rc_hi_ref,
                   blo_ref, bhi_ref, slo_ref, shi_ref,
                   olo_ref, ohi_ref):
    # Chunks are UNROLLED with static slices: a pl.ds dynamic-slice load
    # inside a fori_loop sends Mosaic's lowering into a recursion that blows
    # CPython's C-stack guard. n_chunks <= 15 for every commit block, so the
    # unroll costs ~15 sequential round-loop scans — fine to lower.
    lo, hi = slo_ref[:], shi_ref[:]
    for c in range(n_chunks):
        lo = jnp.concatenate(
            [blo_ref[c * rate : (c + 1) * rate, :], lo[rate:]], axis=0
        )
        hi = jnp.concatenate(
            [bhi_ref[c * rate : (c + 1) * rate, :], hi[rate:]], axis=0
        )
        lo, hi = _permute(lo, hi, rc_lo_ref, rc_hi_ref)
    olo_ref[:] = lo
    ohi_ref[:] = hi


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def sponge_absorb(state: jnp.ndarray, block: jnp.ndarray, tile: int = 1024,
                  interpret: bool = False):
    """Drop-in for poseidon.sponge_absorb on TPU: state [n, 12] u64,
    block [n, k*RATE] u64 -> new state [n, 12] u64 (bit-identical)."""
    from .. import poseidon

    pl, pltpu = _pl()
    n = state.shape[0]
    cols = block.shape[1]
    assert cols % poseidon.RATE == 0 and cols > 0
    assert n % tile == 0, (n, tile)

    slo, shi = u.split_u64(state)
    blo, bhi = u.split_u64(block)
    slo, shi = slo.T, shi.T  # [12, n]
    blo, bhi = blo.T, bhi.T  # [cols, n]
    rc_lo, rc_hi = _rc_u32()

    kern = functools.partial(_sponge_kernel, cols // poseidon.RATE,
                             poseidon.RATE)
    grid = (n // tile,)
    vspec = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    # the kernel is pure u32; trace it with x64 OFF so index-map literals
    # (including the default maps of the SMEM specs) stay i32 — under x64
    # they trace as i64 and Mosaic fails to legalize the index functions
    from jax._src import config as _jcfg

    with _jcfg.enable_x64(False):
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # rc_lo
                pl.BlockSpec(memory_space=pltpu.SMEM),  # rc_hi
                vspec(cols), vspec(cols), vspec(12), vspec(12),
            ],
            out_specs=(vspec(12), vspec(12)),
            out_shape=(
                jax.ShapeDtypeStruct((12, n), jnp.uint32),
                jax.ShapeDtypeStruct((12, n), jnp.uint32),
            ),
            interpret=interpret,
        )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), blo, bhi, slo, shi)
    return u.join_u64(out_lo.T, out_hi.T)


def available() -> bool:
    """True when the default backend is a TPU (incl. the axon tunnel)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")
