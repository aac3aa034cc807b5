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
def _mds_exps() -> tuple[int, ...]:
    from .. import poseidon

    return poseidon._FAST_MDS_EXPS


@functools.lru_cache(maxsize=None)
def _rc_u32() -> tuple[np.ndarray, np.ndarray]:
    from .. import poseidon

    rc, _ = poseidon._constants()  # [30, 12] u64
    return (
        (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (rc >> np.uint64(32)).astype(np.uint32),
    )


def _mds(lo, hi):
    """Circulant power-of-two MDS on [12, T] u32 pairs.

    out[i] = sum_d 2^{e_d} * s[(i+d) % 12]: computed for all i at once by
    accumulating rotated-row copies, mirroring poseidon._mds_layer's exact
    u64 shift-sum + single 128-bit reduction (sums < 2^53, exact)."""
    exps = _mds_exps()
    zero = jnp.zeros_like(lo)
    blo = bhi = alo = ahi = None  # b: sum of shifted lo-halves; a: hi-halves
    for d, e in enumerate(exps):
        rlo = jnp.concatenate([lo[d:], lo[:d]], axis=0) if d else lo
        rhi = jnp.concatenate([hi[d:], hi[:d]], axis=0) if d else hi
        if e == 0:
            tlo, tc = rlo, zero  # 2^0: no shift, no spill into the high word
            ulo, uc = rhi, zero
        else:
            sh, ish = np.uint32(e), np.uint32(32 - e)
            tlo, tc = rlo << sh, rlo >> ish
            ulo, uc = rhi << sh, rhi >> ish
        if blo is None:
            blo, bhi, alo, ahi = tlo, tc, ulo, uc
        else:
            blo, bhi, _ = u.add64(blo, bhi, tlo, tc)
            alo, ahi, _ = u.add64(alo, ahi, ulo, uc)
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
