"""Poseidon permutation over Goldilocks, width 12, batched for TPU.

The reference relies on plonky2's `PoseidonGoldilocksConfig` for every
commitment and Fiat-Shamir transcript (reference src/modular/modular.rs:541-543
and all tests). This is a from-scratch implementation with the same shape:
width 12, rate 8, capacity 4, x^7 S-box, 8 full + 22 partial rounds.

Parameter provenance: round constants are generated deterministically by
SHA-256 counter-mode rejection sampling from a fixed seed string. The MDS
matrix is the circulant with first row FAST_MDS_ROW — every entry a small
power of two, so the layer is shift-adds instead of 144 full 64-bit modmuls
— and it is EXHAUSTIVELY VERIFIED MDS: native/mds_check.cpp checks all
2,704,155 square minors nonsingular over Goldilocks (run it to re-verify).
The module is parameterized so a plonky2-compatible constant set can be
swapped in for transcript parity once those constants are available; proofs
in this framework are self-consistently verified with the constants below.

All functions are batched: a state batch has shape [..., WIDTH] uint64.
"""

from __future__ import annotations

import functools
import hashlib
import os

import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl

WIDTH = 12
RATE = 8
CAPACITY = 4
FULL_ROUNDS = 8  # 4 at the start, 4 at the end
PARTIAL_ROUNDS = 22
ALPHA = 7  # S-box exponent

_SEED = b"starky_bn254_tpu/poseidon/goldilocks-w12/v1"
_DEFAULT_SEED = _SEED


def _sample_field_elements(count: int, label: bytes) -> np.ndarray:
    """Deterministic rejection sampling of canonical Goldilocks elements."""
    out = np.empty(count, dtype=np.uint64)
    i = 0
    ctr = 0
    while i < count:
        h = hashlib.sha256(_SEED + b"/" + label + b"/" + str(ctr).encode()).digest()
        ctr += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off : off + 8], "little")
            if v < gl.P and i < count:
                out[i] = v
                i += 1
    return out


# Circulant MDS first row: all entries small powers of two (exponents
# [0,0,1,0,3,5,1,8,12,3,16,10]); exhaustively verified MDS by
# native/mds_check.cpp (all square minors nonsingular mod p).
FAST_MDS_ROW = (1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024)
_FAST_MDS_EXPS = tuple(int(v).bit_length() - 1 for v in FAST_MDS_ROW)
assert all(1 << e == v for e, v in zip(_FAST_MDS_EXPS, FAST_MDS_ROW))


def set_params(seed: bytes | None = None, mds_row: tuple | None = None):
    """Swap in a different Poseidon parameter set (round-constant seed and/or
    power-of-two circulant MDS first row) for the WHOLE framework.

    This is the hook a plonky2-transcript-parity deployment uses once the
    fork's constants are extractable (SURVEY.md §7 hard part (b)); today it
    de-risks that swap: tests prove under one set and assert proofs are
    rejected under another (tests/test_poseidon.py). Clears every dependent
    cache — the dense/shift MDS tables, the jitted permutation closures that
    baked the old constants in as literals, and jax's global jit caches
    (merkle/challenger graphs traced against the old tables)."""
    global _SEED, FAST_MDS_ROW, _FAST_MDS_EXPS
    import jax as _jax

    if seed is not None:
        _SEED = bytes(seed)
    if mds_row is not None:
        mds_row = tuple(int(v) for v in mds_row)
        assert len(mds_row) == WIDTH
        exps = tuple(int(v).bit_length() - 1 for v in mds_row)
        assert all(1 << e == v for e, v in zip(exps, mds_row)), (
            "the device MDS layer is shift-adds: entries must be powers of two"
        )
        FAST_MDS_ROW = mds_row
        _FAST_MDS_EXPS = exps
    _constants.cache_clear()
    try:  # the Pallas kernel caches the constants in its own u32 form
        from .pallas import poseidon_kernel as _pk

        _pk._rc_u32.cache_clear()
        _pk._mds_exps.cache_clear()
    except Exception:  # pragma: no cover
        pass
    _jax.clear_caches()


@functools.lru_cache(maxsize=None)
def _constants():
    n_rounds = FULL_ROUNDS + PARTIAL_ROUNDS
    rc = _sample_field_elements(n_rounds * WIDTH, b"rc").reshape(n_rounds, WIDTH)
    # dense form of the circulant (host challenger + tests use this; the
    # device layer uses the shift form below)
    mds = np.empty((WIDTH, WIDTH), dtype=np.uint64)
    for i in range(WIDTH):
        for j in range(WIDTH):
            mds[i, j] = FAST_MDS_ROW[(j - i) % WIDTH]
    return rc, mds


def _sbox(x):
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


_MASK32 = np.uint64(0xFFFFFFFF)


@functools.lru_cache(maxsize=None)
def _mds_gather_idx():
    # out[i] = sum_d row[d] * s[(i + d) % WIDTH]
    return np.array(
        [[(i + d) % WIDTH for d in range(WIDTH)] for i in range(WIDTH)],
        dtype=np.int32,
    )


def _mds_layer(state, mds=None):
    """Circulant power-of-two MDS as shift-adds in exact u32 halves.

    out[i] = sum_d 2^{e_d} * s[(i+d)%12]. Each s splits as hi*2^32 + lo;
    the shifted-hi and shifted-lo sums stay < 2^53 (12 terms < 2^48 each),
    then one 128-bit reduction folds A*2^32 + B mod p. ~20 vector ops per
    layer instead of 144 full 64-bit modmuls (the layer dominates the
    permutation's cost: 144 of ~180 muls per round in the dense form).

    Engine-agnostic (xnp): under jit it traces to the device graph; on
    numpy inputs it runs eagerly on the host (the challenger's vector
    digests and any tunnel-independent verification use that path).
    """
    from . import xnp

    idx = _mds_gather_idx()  # [out, d] numpy: plain constant either engine
    exps = np.array(_FAST_MDS_EXPS, dtype=np.uint64)
    g = state[..., idx]  # [..., out, d]
    lo = (g & _MASK32) << exps
    hi = (g >> np.uint64(32)) << exps
    b = xnp.sum(lo, axis=-1)  # < 2^53, exact in u64
    a = xnp.sum(hi, axis=-1)
    v_hi = a >> np.uint64(32)
    v_lo_part = (a & _MASK32) << np.uint64(32)
    v_lo = v_lo_part + b
    carry = (v_lo < v_lo_part).astype(np.uint64)
    return gl._reduce128(v_hi + carry, v_lo)


def _permute_impl(state: jnp.ndarray) -> jnp.ndarray:
    from . import xnp

    rc, _ = _constants()
    rc_j = xnp.asarray(rc)

    half = FULL_ROUNDS // 2
    r = 0
    for _ in range(half):
        state = gl.add(state, rc_j[r])
        state = _sbox(state)
        state = _mds_layer(state)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        state = gl.add(state, rc_j[r])
        s0 = _sbox(state[..., 0])
        state = xnp.at_set(state, (Ellipsis, 0), s0)
        state = _mds_layer(state)
        r += 1
    for _ in range(half):
        state = gl.add(state, rc_j[r])
        state = _sbox(state)
        state = _mds_layer(state)
        r += 1
    return state


import jax

permute = jax.jit(_permute_impl)


def _pallas_disabled() -> bool:
    from . import pallas as _pallas

    return _pallas.xla_only_active()


def hash_no_pad(inputs: jnp.ndarray) -> jnp.ndarray:
    """Fixed-length overwrite-mode sponge: [..., n] -> [..., 4] digest.

    2-D batches with a TPU-tileable row count route through the Pallas
    sponge kernel (5.6x the XLA scan at commit shapes — this is the Merkle
    LEAF hashing path, the bulk of every commit's hash work). Zero-padding
    the width to a RATE multiple reproduces the XLA path's separate
    zero-padded tail absorption exactly, so digests are bit-identical."""
    n = inputs.shape[-1]
    if (
        inputs.ndim == 2
        and n > 4
        and inputs.shape[0] % _PALLAS_TILE == 0
        and not os.environ.get("STARKY_NO_PALLAS")
        and not os.environ.get("STARKY_NO_PALLAS_SPONGE")
        and not _pallas_disabled()
    ):
        from .pallas import poseidon_kernel as _pk

        if _pk.available():
            pad = (-n) % RATE
            x = jnp.pad(inputs, ((0, 0), (0, pad))) if pad else inputs
            state = jnp.zeros((inputs.shape[0], WIDTH), dtype=jnp.uint64)
            # the kernel unrolls its chunk loop (<= 15 chunks per call);
            # wider rows chain state across 120-col blocks — the same
            # overwrite-mode chunk sequence, so digests are bit-identical
            for off in range(0, x.shape[1], 15 * RATE):
                state = _pk.sponge_absorb(
                    state, x[:, off : off + 15 * RATE], tile=_PALLAS_TILE
                )
            return state[:, :4]
    return _hash_no_pad_xla(inputs)


@jax.jit
def _hash_no_pad_xla(inputs: jnp.ndarray) -> jnp.ndarray:
    """XLA-scan sponge (any shape/backend).

    Full rate-sized chunks are absorbed via a lax.scan whose body slices
    the chunk straight out of the input (ONE permutation in the graph
    regardless of leaf width), and the sub-rate tail is zero-padded and
    absorbed separately. No padded copy / chunk-stack of the whole input
    is materialized — at a [2^20, 404] Merkle leaf matrix those transients
    were 2 x 3.3 GB and OOM'd the chip.
    """
    *batch, n = inputs.shape
    n_full = n // RATE
    # derive the zero state from the input so device-varying axis annotations
    # propagate correctly under shard_map (scan carry must match)
    state = jnp.zeros((*batch, WIDTH), dtype=jnp.uint64) + inputs[..., :1] * np.uint64(0)

    if n_full:

        def body(st, i):
            chunk = jax.lax.dynamic_slice_in_dim(inputs, i * RATE, RATE, axis=-1)
            st = st.at[..., :RATE].set(chunk)
            return permute(st), None

        state, _ = jax.lax.scan(body, state, jnp.arange(n_full))

    rem = n - n_full * RATE
    if rem:
        tail = jnp.zeros((*batch, RATE), dtype=jnp.uint64)
        tail = tail.at[..., :rem].set(inputs[..., n_full * RATE :])
        state = state.at[..., :RATE].set(tail)
        state = permute(state)
    return state[..., :4]


@jax.jit
def _sponge_absorb_xla(state: jnp.ndarray, block: jnp.ndarray) -> jnp.ndarray:
    n = block.shape[-1]

    def body(st, i):
        chunk = jax.lax.dynamic_slice_in_dim(block, i * RATE, RATE, axis=-1)
        st = st.at[..., :RATE].set(chunk)
        return permute(st), None

    state, _ = jax.lax.scan(body, state, jnp.arange(n // RATE))
    return state


_PALLAS_TILE = 512  # measured optimum at [2^20, 120] (987 ms vs 1085 @1024)


def sponge_absorb(state: jnp.ndarray, block: jnp.ndarray) -> jnp.ndarray:
    """Absorb a column block (width a multiple of RATE) into running sponge
    states: state [..., WIDTH], block [..., k*RATE] -> new state.

    Chaining sponge_absorb over column blocks produces bit-identical
    digests to hash_no_pad over the concatenated row (same overwrite-mode
    chunk sequence) — the streaming-commit path hashes multi-GB LDEs
    block by block without ever holding the whole matrix's absorb graph.

    On TPU the work runs in the VMEM-resident Pallas kernel
    (pallas/poseidon_kernel.py, 5.6x the XLA scan at the commit shapes);
    results are bit-identical (tests/test_pallas_kernels.py)."""
    n = block.shape[-1]
    assert n % RATE == 0 and n > 0

    if (
        state.ndim == 2
        and block.ndim == 2
        and state.shape[0] % _PALLAS_TILE == 0
        and not os.environ.get("STARKY_NO_PALLAS")
        and not os.environ.get("STARKY_NO_PALLAS_SPONGE")
        and not _pallas_disabled()
    ):
        from .pallas import poseidon_kernel as _pk

        if _pk.available():
            return _pk.sponge_absorb(state, block, tile=_PALLAS_TILE)
    return _sponge_absorb_xla(state, block)


def hash_or_noop(inputs: jnp.ndarray) -> jnp.ndarray:
    """[..., n] -> [..., 4]: values <= 4 wide are zero-padded, not hashed."""
    n = inputs.shape[-1]
    if n <= 4:
        pad = [(0, 0)] * (inputs.ndim - 1) + [(0, 4 - n)]
        return jnp.pad(inputs, pad)
    return hash_no_pad(inputs)


@jax.jit
def compress(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Two-to-one compression: [..., 4] x [..., 4] -> [..., 4]."""
    *batch, _ = left.shape
    state = jnp.zeros((*batch, WIDTH), dtype=jnp.uint64)
    state = state.at[..., 0:4].set(left)
    state = state.at[..., 4:8].set(right)
    return permute(state)[..., :4]
