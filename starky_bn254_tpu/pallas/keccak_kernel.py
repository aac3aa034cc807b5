"""Pallas TPU kernel for the Keccak-f[1600] sponge (keccak.py's hot path).

Mosaic has no 64-bit integers, so every lane is an explicit u32 (lo, hi)
pair — but unlike Poseidon there is no modular arithmetic at all: the whole
permutation is XOR/AND-NOT plus static 64-bit rotations, each of which is
2-6 native VPU u32 ops. The XLA path measured ~151 ms for the [2^17, 404]
leaf-hash (2.9x the Pallas Poseidon); the VPU op-count floor is ~50 ms —
this kernel exists to close that gap by keeping the whole 24-round state
walk in VMEM registers instead of HBM-roundtripping between XLA fusions.

Layout mirrors pallas/poseidon_kernel.py: state [25, T] pairs resident in
VMEM, absorb chunks unrolled statically (<= 15 per call; wider streams
chain calls), rounds in a fori_loop with the RC words in SMEM. Digest
bit-identity with keccak._sponge_absorb_xla is pinned by
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .. import keccak as _keccak

RATE = _keccak.RATE
WIDTH = _keccak.WIDTH


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _rc_u32() -> tuple[np.ndarray, np.ndarray]:
    rc = np.array(_keccak._round_constants(), dtype=np.uint64)
    return (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32), (
        rc >> np.uint64(32)
    ).astype(np.uint32)


def _rol(lo, hi, k: int):
    """64-bit rotate-left by a STATIC k on a u32 pair."""
    k %= 64
    if k == 0:
        return lo, hi
    if k == 32:
        return hi, lo
    if k > 32:
        lo, hi = hi, lo
        k -= 32
    kl = np.uint32(k)
    kr = np.uint32(32 - k)
    return (lo << kl) | (hi >> kr), (hi << kl) | (lo >> kr)


def _round(lanes, rc_lo, rc_hi):
    """One Keccak round on 25 (lo, hi) pairs; rc as u32 SMEM scalars."""
    rho = _keccak._rho_offsets()
    lo = [p[0] for p in lanes]
    hi = [p[1] for p in lanes]
    # theta
    clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
    chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
    dlo, dhi = [], []
    for x in range(5):
        rl, rh = _rol(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
        dlo.append(clo[(x - 1) % 5] ^ rl)
        dhi.append(chi_[(x - 1) % 5] ^ rh)
    lo = [lo[i] ^ dlo[i % 5] for i in range(25)]
    hi = [hi[i] ^ dhi[i % 5] for i in range(25)]
    # rho + pi
    blo = [None] * 25
    bhi = [None] * 25
    for xx in range(5):
        for yy in range(5):
            i = xx + 5 * yy
            j = yy + 5 * ((2 * xx + 3 * yy) % 5)
            blo[j], bhi[j] = _rol(lo[i], hi[i], rho[i])
    # chi
    out = []
    for y in range(5):
        for x in range(5):
            i = x + 5 * y
            i1 = (x + 1) % 5 + 5 * y
            i2 = (x + 2) % 5 + 5 * y
            out.append(
                (
                    blo[i] ^ ((~blo[i1]) & blo[i2]),
                    bhi[i] ^ ((~bhi[i1]) & bhi[i2]),
                )
            )
    # iota
    out[0] = (out[0][0] ^ rc_lo, out[0][1] ^ rc_hi)
    return out


def _permute(state_lo, state_hi, rc_lo_ref, rc_hi_ref):
    """Full 24 rounds on [25, T] pairs; rounds rolled in a fori_loop."""

    def body(r, st):
        lo, hi = st
        lanes = [(lo[i], hi[i]) for i in range(WIDTH)]
        lanes = _round(lanes, rc_lo_ref[r], rc_hi_ref[r])
        return (
            jnp.stack([p[0] for p in lanes]),
            jnp.stack([p[1] for p in lanes]),
        )

    return jax.lax.fori_loop(0, 24, body, (state_lo, state_hi))


def _sponge_kernel(n_chunks: int,
                   rc_lo_ref, rc_hi_ref,
                   blo_ref, bhi_ref, slo_ref, shi_ref,
                   olo_ref, ohi_ref):
    # chunks unrolled with static slices (same Mosaic-recursion rationale as
    # poseidon_kernel._sponge_kernel; n_chunks <= 15 per call)
    lo, hi = slo_ref[:], shi_ref[:]
    for c in range(n_chunks):
        xlo = blo_ref[c * RATE : (c + 1) * RATE, :] ^ lo[:RATE]
        xhi = bhi_ref[c * RATE : (c + 1) * RATE, :] ^ hi[:RATE]
        lo = jnp.concatenate([xlo, lo[RATE:]], axis=0)
        hi = jnp.concatenate([xhi, hi[RATE:]], axis=0)
        lo, hi = _permute(lo, hi, rc_lo_ref, rc_hi_ref)
    olo_ref[:] = lo
    ohi_ref[:] = hi


def _split_u64(x):
    return (x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32), (
        x >> np.uint64(32)
    ).astype(jnp.uint32)


def _join_u64(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def sponge_absorb(state: jnp.ndarray, block: jnp.ndarray, tile: int = 512,
                  interpret: bool = False):
    """Drop-in for keccak._sponge_absorb_xla: state [n, 25] u64,
    block [n, k*RATE] u64 -> new state [n, 25] u64 (bit-identical)."""
    pl, pltpu = _pl()
    n = state.shape[0]
    cols = block.shape[1]
    assert cols % RATE == 0 and cols > 0
    assert n % tile == 0, (n, tile)

    slo, shi = _split_u64(state)
    blo, bhi = _split_u64(block)
    slo, shi = slo.T, shi.T  # [25, n]
    blo, bhi = blo.T, bhi.T  # [cols, n]
    rc_lo, rc_hi = _rc_u32()

    kern = functools.partial(_sponge_kernel, cols // RATE)
    grid = (n // tile,)
    vspec = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    from jax._src import config as _jcfg

    with _jcfg.enable_x64(False):  # same i32 index-map rule as poseidon
        out_lo, out_hi = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # rc_lo
                pl.BlockSpec(memory_space=pltpu.SMEM),  # rc_hi
                vspec(cols), vspec(cols), vspec(WIDTH), vspec(WIDTH),
            ],
            out_specs=(vspec(WIDTH), vspec(WIDTH)),
            out_shape=(
                jax.ShapeDtypeStruct((WIDTH, n), jnp.uint32),
                jax.ShapeDtypeStruct((WIDTH, n), jnp.uint32),
            ),
            interpret=interpret,
        )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), blo, bhi, slo, shi)
    return _join_u64(out_lo.T, out_hi.T)


def available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat == "tpu"


_KERNEL_OK: bool | None = None


def kernel_ok() -> bool:
    """One-shot self-test against the XLA path (same contract as
    poseidon_kernel.kernel_ok): a Mosaic regression disables the kernel
    instead of corrupting digests."""
    global _KERNEL_OK
    if _KERNEL_OK is None:
        try:
            import numpy as _np

            rng = _np.random.default_rng(7)
            st = jnp.asarray(
                rng.integers(0, 1 << 63, size=(512, WIDTH), dtype=_np.uint64)
            )
            blk = jnp.asarray(
                rng.integers(0, 1 << 63, size=(512, RATE), dtype=_np.uint64)
            )
            want = _keccak._sponge_absorb_xla(st, blk)
            got = sponge_absorb(st, blk, tile=512)
            _KERNEL_OK = bool(jnp.array_equal(want, got))
        except Exception:
            _KERNEL_OK = False
    return _KERNEL_OK
