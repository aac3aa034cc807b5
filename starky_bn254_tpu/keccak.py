"""Keccak-f[1600] Merkle hasher — the TPU-fast alternative to Poseidon.

The reference's proving layer is generic over plonky2's `GenericConfig`,
whose two shipped instantiations are PoseidonGoldilocksConfig and
KeccakGoldilocksConfig (plonky2 `plonky2/src/config.rs`; the reference pins
Poseidon at src/modular/modular.rs:541-543 because its *recursive* layer
needs an algebraic hash in-circuit). This framework's SNARK-recursion layer
is out of scope (SURVEY.md §7.8), so the vector-commitment hash is a free
config choice — and on a TPU the choice is stark:

* Poseidon width-12 costs ~45k u32 VPU ops per permutation (emulated 64-bit
  modmuls dominate; measured 16.2 M perm/s on the v5-lite chip, compute
  bound — BASELINE.md round-4 roofline) and absorbs 8 words per permutation:
  ~5.6k VPU ops per absorbed word.
* Keccak-f[1600] is pure 64-bit XOR/AND/NOT/rotate — each lowers to 2-6
  native u32 VPU ops with NO multiplier emulation — ~12k u32 ops per
  permutation, and absorbs 17 words per permutation: ~0.7k VPU ops per
  absorbed word.  =>  ~8x less VPU work for the same absorb stream.

Merkle leaf hashing is the measured throughput ceiling of a warm prove
(BASELINE.md: the two big commits are sponge-bound), so `FriConfig
(merkle_hash="keccak")` moves the whole prove off the Poseidon VPU floor.
The Fiat-Shamir challenger and the FRI proof-of-work stay on Poseidon in
every mode: they hash a few hundred elements per proof (microseconds) and
keeping them fixed means the transcript discipline — and the parity mode —
are untouched by the Merkle-hash choice.

Security: standard Keccak sponge, capacity 8 lanes = 512 bits (256-bit
collision resistance, same margin as the 4-word Poseidon capacity), 10*1
multi-rate padding applied at word granularity, digest = first 4 lanes.
Round constants and rotation offsets are DERIVED here from the Keccak
reference definition (LFSR x^8+x^6+x^5+x^4+1 and the (t+1)(t+2)/2 pi-walk)
rather than transcribed, and tests/test_keccak.py pins the full SHA3-256
construction built on this permutation against hashlib.sha3_256.

All functions are engine-polymorphic like the rest of the framework: numpy
arrays stay on the host (the verifier's replay path), jax arrays run the
same graph under jit on the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

WIDTH = 25  # lanes (u64 words) of state
RATE = 17  # absorbed lanes per permutation (1088-bit rate / 512-bit capacity)
CAPACITY = 8
ROUNDS = 24
DIGEST = 4


@functools.lru_cache(maxsize=None)
def _round_constants() -> tuple[int, ...]:
    """RC[i] from the degree-8 LFSR of the Keccak reference (FIPS 202 B.2)."""

    def rc_bit(t: int) -> int:
        if t % 255 == 0:
            return 1
        r = 1  # 8-bit register, bit 0 = newest
        for _ in range(t % 255):
            r <<= 1
            if r & 0x100:
                r ^= 0x171  # x^8 + x^6 + x^5 + x^4 + 1
        return r & 1

    out = []
    for i in range(ROUNDS):
        rc = 0
        for j in range(7):
            if rc_bit(7 * i + j):
                rc |= 1 << ((1 << j) - 1)
        out.append(rc)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _rho_offsets() -> tuple[int, ...]:
    """Rotation offset per lane index x + 5*y, from the pi-walk recurrence."""
    r = [0] * 25
    x, y = 1, 0
    for t in range(24):
        r[x + 5 * y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return tuple(r)


def _rol(v, k: int):
    if k == 0:
        return v
    return (v << np.uint64(k)) | (v >> np.uint64(64 - k))


def _round_lanes(a: list, rc):
    """One Keccak round over 25 lane arrays (engine-polymorphic ops);
    rc: the round constant (np.uint64 scalar or a traced jnp scalar)."""
    rho = _rho_offsets()
    # theta
    c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
    d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
    a = [a[i] ^ d[i % 5] for i in range(25)]
    # rho + pi: B[y, 2x+3y] = rol(A[x, y])
    b = [None] * 25
    for xx in range(5):
        for yy in range(5):
            i = xx + 5 * yy
            b[yy + 5 * ((2 * xx + 3 * yy) % 5)] = _rol(a[i], rho[i])
    # chi
    a = [
        b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
        for y in range(5)
        for x in range(5)
    ]
    # iota
    a[0] = a[0] ^ rc
    return a


def _permute_lanes(a: list):
    """Full Keccak-f[1600] over 25 lane arrays, rounds unrolled (host
    numpy path and the SHA3 self-check; tiny arrays, Python-loop cost)."""
    for rc in _round_constants():
        a = _round_lanes(a, np.uint64(rc))
    return a


def _permute_rolled(state: jnp.ndarray) -> jnp.ndarray:
    """Device permutation with the 24 rounds ROLLED into a lax.scan over
    the round-constant vector: the graph holds ONE round (~170 u64 ops),
    not 24 — the unrolled form compiled pathologically (66 s for a 4-
    permutation graph on XLA:CPU, and the whole-tree builders would have
    multiplied that by the level count; same lesson as the round-4 rolled
    Poseidon rounds)."""

    def body(st, rc):
        lanes = [st[..., i] for i in range(WIDTH)]
        lanes = _round_lanes(lanes, rc)
        return jnp.stack(lanes, axis=-1), None

    rcs = jnp.asarray(np.array(_round_constants(), dtype=np.uint64))
    out, _ = jax.lax.scan(body, state, rcs)
    return out


def permute(state):
    """state [..., 25] u64 -> [..., 25]; numpy in -> numpy out."""
    if isinstance(state, np.ndarray):
        lanes = [state[..., i] for i in range(WIDTH)]
        return np.stack(_permute_lanes(lanes), axis=-1)
    return _permute_rolled(state)


def _absorb_block_lanes(lanes: list, block):
    """XOR a [..., RATE] block into the rate lanes and permute."""
    lanes = [
        (lanes[i] ^ block[..., i]) if i < RATE else lanes[i] for i in range(WIDTH)
    ]
    return _permute_lanes(lanes)


def _pad_tail(tail, eng):
    """10*1 multi-rate padding at word granularity: tail [..., r] with
    r < RATE -> one [..., RATE] final block (pad word 0x01, zeros, MSB of
    the last word set). Injective over word streams of any length."""
    *batch, r = tail.shape
    assert r < RATE
    pad = eng.zeros((*batch, RATE - r), dtype=np.uint64)
    block = eng.concatenate([tail, pad], axis=-1)
    one = np.uint64(1)
    msb = np.uint64(1 << 63)
    if isinstance(block, np.ndarray):
        block[..., r] ^= one
        block[..., RATE - 1] ^= msb
    else:
        block = block.at[..., r].set(block[..., r] ^ one)
        block = block.at[..., RATE - 1].set(block[..., RATE - 1] ^ msb)
    return block


def _hash_no_pad_np(inputs: np.ndarray) -> np.ndarray:
    *batch, n = inputs.shape
    lanes = [np.zeros(tuple(batch), dtype=np.uint64) for _ in range(WIDTH)]
    n_full = n // RATE
    for i in range(n_full):
        lanes = _absorb_block_lanes(lanes, inputs[..., i * RATE : (i + 1) * RATE])
    tail = inputs[..., n_full * RATE :]
    lanes = _absorb_block_lanes(lanes, _pad_tail(tail, np))
    return np.stack(lanes[:DIGEST], axis=-1)


@jax.jit
def _hash_no_pad_xla(inputs: jnp.ndarray) -> jnp.ndarray:
    """One permutation in the graph regardless of leaf width (lax.scan over
    full-rate chunks, same shape discipline as poseidon._hash_no_pad_xla)."""
    *batch, n = inputs.shape
    state = jnp.zeros((*batch, WIDTH), dtype=jnp.uint64) + inputs[..., :1] * np.uint64(0)
    n_full = n // RATE

    if n_full:

        def body(st, i):
            chunk = jax.lax.dynamic_slice_in_dim(inputs, i * RATE, RATE, axis=-1)
            st = st.at[..., :RATE].set(st[..., :RATE] ^ chunk)
            return permute(st), None

        state, _ = jax.lax.scan(body, state, jnp.arange(n_full))

    tail = inputs[..., n_full * RATE :]
    block = _pad_tail(tail, jnp)
    state = state.at[..., :RATE].set(state[..., :RATE] ^ block)
    state = permute(state)
    return state[..., :DIGEST]


_PALLAS_TILE = 512


def _pallas_ready(rows: int) -> bool:
    import os

    if os.environ.get("STARKY_NO_PALLAS") or os.environ.get(
        "STARKY_NO_PALLAS_SPONGE"
    ):
        return False
    if rows % _PALLAS_TILE:
        return False
    from . import pallas as _pallas

    if _pallas.xla_only_active():
        return False
    from .pallas import keccak_kernel as _kk

    return _kk.available() and _kk.kernel_ok()


def hash_no_pad(inputs) -> np.ndarray:
    """[..., n] -> [..., 4] digest (final-block 10*1 padding included).

    2-D TPU batches route through the Pallas kernel
    (pallas/keccak_kernel.py): the padded chunk stream is built once and
    absorbed in <= 15-chunk kernel calls with the state resident in VMEM —
    the same XOR-chunk sequence as the XLA scan, digests bit-identical."""
    if isinstance(inputs, np.ndarray):
        return _hash_no_pad_np(inputs)
    n = inputs.shape[-1]
    if inputs.ndim == 2 and n > 4 and _pallas_ready(inputs.shape[0]):
        from .pallas import keccak_kernel as _kk

        n_full = n // RATE
        stream = jnp.concatenate(
            [inputs[:, : n_full * RATE], _pad_tail(inputs[:, n_full * RATE :], jnp)],
            axis=1,
        )
        state = jnp.zeros((inputs.shape[0], WIDTH), dtype=jnp.uint64)
        for off in range(0, stream.shape[1], 15 * RATE):
            state = _kk.sponge_absorb(
                state, stream[:, off : off + 15 * RATE], tile=_PALLAS_TILE
            )
        return state[:, :DIGEST]
    return _hash_no_pad_xla(inputs)


def hash_or_noop(inputs):
    """[..., n] -> [..., 4]: values <= 4 wide are zero-padded, not hashed
    (same leaf rule as poseidon.hash_or_noop; merkle.py relies on it)."""
    eng = np if isinstance(inputs, np.ndarray) else jnp
    n = inputs.shape[-1]
    if n <= 4:
        pad = [(0, 0)] * (inputs.ndim - 1) + [(0, 4 - n)]
        return eng.pad(inputs, pad)
    return hash_no_pad(inputs)


@jax.jit
def _sponge_absorb_xla(state: jnp.ndarray, block: jnp.ndarray) -> jnp.ndarray:
    n = block.shape[-1]

    def body(st, i):
        chunk = jax.lax.dynamic_slice_in_dim(block, i * RATE, RATE, axis=-1)
        st = st.at[..., :RATE].set(st[..., :RATE] ^ chunk)
        return permute(st), None

    state, _ = jax.lax.scan(body, state, jnp.arange(n // RATE))
    return state


def sponge_absorb(state, block):
    """Absorb a column block (width a multiple of RATE) into running sponge
    states: state [..., WIDTH], block [..., k*RATE] -> new state. Chaining
    sponge_absorb over blocks + finalize(tail) is bit-identical to
    hash_no_pad over the concatenated row (same XOR-chunk sequence)."""
    n = block.shape[-1]
    assert n % RATE == 0 and n > 0
    if isinstance(state, np.ndarray):
        lanes = [state[..., i] for i in range(WIDTH)]
        for i in range(n // RATE):
            lanes = _absorb_block_lanes(lanes, block[..., i * RATE : (i + 1) * RATE])
        return np.stack(lanes, axis=-1)
    if state.ndim == 2 and block.ndim == 2 and _pallas_ready(state.shape[0]):
        from .pallas import keccak_kernel as _kk

        for off in range(0, n, 15 * RATE):
            state = _kk.sponge_absorb(
                state, block[:, off : off + 15 * RATE], tile=_PALLAS_TILE
            )
        return state
    return _sponge_absorb_xla(state, block)


@jax.jit
def _finalize_xla(state: jnp.ndarray, tail: jnp.ndarray) -> jnp.ndarray:
    block = _pad_tail(tail, jnp)
    state = state.at[..., :RATE].set(state[..., :RATE] ^ block)
    return permute(state)[..., :DIGEST]


def finalize(state, tail=None):
    """Absorb the sub-rate tail (possibly zero-width) with padding and
    return the [..., 4] digests. Every hash_no_pad stream MUST end here
    (the pad block always runs, so streaming and one-shot digests match)."""
    eng = np if isinstance(state, np.ndarray) else jnp
    if tail is None:
        tail = eng.zeros((*state.shape[:-1], 0), dtype=np.uint64)
    if isinstance(state, np.ndarray):
        lanes = [state[..., i] for i in range(WIDTH)]
        lanes = _absorb_block_lanes(lanes, _pad_tail(tail, np))
        return np.stack(lanes[:DIGEST], axis=-1)
    if state.ndim == 2 and _pallas_ready(state.shape[0]):
        from .pallas import keccak_kernel as _kk

        state = _kk.sponge_absorb(
            state, _pad_tail(jnp.asarray(tail), jnp), tile=_PALLAS_TILE
        )
        return state[:, :DIGEST]
    return _finalize_xla(state, tail)


@jax.jit
def _compress_xla(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    *batch, _ = left.shape
    tail = jnp.concatenate([left, right], axis=-1)  # 8 words < RATE
    state = jnp.zeros((*batch, WIDTH), dtype=jnp.uint64)
    block = _pad_tail(tail, jnp)
    state = state.at[..., :RATE].set(block)
    return permute(state)[..., :DIGEST]


def compress(left, right):
    """Two-to-one digest compression: [..., 4] x [..., 4] -> [..., 4].
    One permutation (8 words + padding fit a single rate block)."""
    if isinstance(left, np.ndarray):
        *batch, _ = left.shape
        lanes = [np.zeros(tuple(batch), dtype=np.uint64) for _ in range(WIDTH)]
        tail = np.concatenate([left, right], axis=-1)
        lanes = _absorb_block_lanes(lanes, _pad_tail(tail, np))
        return np.stack(lanes[:DIGEST], axis=-1)
    return _compress_xla(left, right)


# ---------------------------------------------------------------------------
# SHA3-256 on top of the permutation — exists ONLY so tests can pin the
# permutation against hashlib (FIPS 202 vectors cover every round constant,
# rotation offset and the state indexing in one equality).


def sha3_256(data: bytes) -> bytes:
    rate_bytes = 136
    padded = bytearray(data)
    pad_len = rate_bytes - (len(padded) % rate_bytes)
    padded += b"\x06" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b""
    if pad_len == 1:
        padded += b"\x86"
    lanes = [np.zeros((), dtype=np.uint64) for _ in range(WIDTH)]
    for off in range(0, len(padded), rate_bytes):
        block = padded[off : off + rate_bytes]
        words = np.frombuffer(bytes(block), dtype="<u8")
        lanes = [
            lanes[i] ^ words[i] if i < rate_bytes // 8 else lanes[i]
            for i in range(WIDTH)
        ]
        lanes = _permute_lanes(lanes)
    out = np.stack(lanes[:4]).astype("<u8").tobytes()
    return out[:32]
