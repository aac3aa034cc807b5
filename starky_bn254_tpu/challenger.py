"""Duplex Fiat-Shamir challenger over the Poseidon sponge.

Replaces plonky2's `Challenger` (implicit in every reference `prove`/`verify`
call; SURVEY.md 2b "Fiat-Shamir challenger"). Overwrite-mode duplex: observed
elements fill the rate portion and trigger permutations; challenges are
squeezed from the rate portion. Deterministic and identical between prover
and verifier by construction.

The transcript runs on the host with exact Python-int Poseidon (a few
thousand modmuls per permutation — microseconds); the batched device Poseidon
in `poseidon.py` shares the same constants, and `tests/test_poseidon.py`
pins host/device bit-equality.
"""

from __future__ import annotations

import numpy as np

from . import goldilocks as gl
from . import poseidon

# Vectors at least this long are observed as a batched tree digest instead of
# element-by-element (see Challenger.observe_elements). At the 2^20-row
# targets the flat openings/PI vectors reach 10^5 elements; per-element
# duplexing costs one host Poseidon permutation per RATE elements (~14k
# sequential pure-Python permutations), while the tree digest is O(log)
# batched device dispatches.
VECTOR_OBSERVE_MIN = 128

_LEAF_WIDTH = 128  # elements per tree leaf (16 sponge chunks)


def _permute_host(state: list[int]) -> list[int]:
    """Pure-Python Poseidon permutation (must match poseidon.permute)."""
    rc, mds = poseidon._constants()
    p = gl.P
    w = poseidon.WIDTH
    half = poseidon.FULL_ROUNDS // 2
    mds_i = [[int(mds[i, j]) for j in range(w)] for i in range(w)]

    def sbox(x):
        x2 = x * x % p
        x4 = x2 * x2 % p
        return x4 * x2 % p * x % p

    def mds_layer(s):
        return [sum(mds_i[i][j] * s[j] for j in range(w)) % p for i in range(w)]

    r = 0
    s = list(state)
    for _ in range(half):
        s = [(x + int(rc[r][i])) % p for i, x in enumerate(s)]
        s = [sbox(x) for x in s]
        s = mds_layer(s)
        r += 1
    for _ in range(poseidon.PARTIAL_ROUNDS):
        s = [(x + int(rc[r][i])) % p for i, x in enumerate(s)]
        s[0] = sbox(s[0])
        s = mds_layer(s)
        r += 1
    for _ in range(half):
        s = [(x + int(rc[r][i])) % p for i, x in enumerate(s)]
        s = [sbox(x) for x in s]
        s = mds_layer(s)
        r += 1
    return s


def _hash_vector_tree(xs: np.ndarray) -> np.ndarray:
    """[n] u64 -> [4] digest: batched leaf sponges + binary compress tree.

    All-device, O(log n) dispatches; every shape-distinct graph is tiny
    (one scan of 16 permutations for the leaves, one permutation per
    compress level) so cold compiles stay in the milliseconds."""
    import jax.numpy as jnp

    n = xs.size
    m = -(-n // _LEAF_WIDTH)
    mat = np.zeros((m, _LEAF_WIDTH), dtype=np.uint64)
    mat.reshape(-1)[:n] = xs
    d = poseidon.hash_no_pad(jnp.asarray(mat))  # [m, 4]
    while d.shape[0] > 1:
        if d.shape[0] % 2:
            d = jnp.concatenate([d, jnp.zeros((1, 4), dtype=jnp.uint64)])
        d = poseidon.compress(d[0::2], d[1::2])
    return np.asarray(d[0])


class Challenger:
    """parity=True disables the batched tree-digest observation so every
    element passes through the duplex exactly as plonky2's challenger would
    (observe_element appends; a full RATE buffer or a squeeze triggers the
    overwrite-mode duplex; challenges pop from the END of the squeezed rate
    window). The duplex core is identical in both modes."""

    def __init__(self, parity: bool = False):
        self.parity = parity
        self.state = [0] * poseidon.WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    # -- observing ----------------------------------------------------------
    def observe_element(self, x: int):
        assert 0 <= x < gl.P
        self.output_buffer = []
        self.input_buffer.append(int(x))
        if len(self.input_buffer) == poseidon.RATE:
            self._duplex()

    def observe_elements(self, xs):
        xs = np.asarray(xs, dtype=np.uint64).reshape(-1)
        if not self.parity and xs.size >= VECTOR_OBSERVE_MIN:
            # batched tree digest: bit-identical between prover and verifier
            # by construction (both call this same path on the same vector).
            # The length is absorbed first so vectors of different lengths
            # can never alias, then the 4-element digest.
            self.observe_element(xs.size % gl.P)
            for d in _hash_vector_tree(xs):
                self.observe_element(int(d))
            return
        for x in xs:
            self.observe_element(int(x))

    def observe_cap(self, cap):
        # reduce digest words into the field before observing: a no-op for
        # Poseidon caps (already canonical Goldilocks elements) and the
        # deterministic embedding for Keccak caps, whose 64-bit words may
        # exceed p. Prover and verifier both observe through this path, so
        # the transcript stays in agreement; the Merkle checks themselves
        # compare the UNREDUCED u64 digests.
        self.observe_elements(np.asarray(cap, dtype=np.uint64) % np.uint64(gl.P))

    def observe_ext(self, x):
        self.observe_elements(np.asarray(x, dtype=np.uint64))

    # -- squeezing ----------------------------------------------------------
    def _duplex(self):
        for i, x in enumerate(self.input_buffer):
            self.state[i] = x
        self.state = _permute_host(self.state)
        self.input_buffer = []
        self.output_buffer = list(self.state[: poseidon.RATE])

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_ext_challenge(self) -> tuple[int, int]:
        return (self.get_challenge(), self.get_challenge())

    def get_indices(self, n_queries: int, domain_size: int) -> list[int]:
        # domain_size is a power of two, so the mask equals plonky2's
        # `to_canonical_u64() % lde_size` index derivation exactly
        assert domain_size & (domain_size - 1) == 0
        return [self.get_challenge() & (domain_size - 1) for _ in range(n_queries)]

    def snapshot(self) -> tuple[list[int], list[int]]:
        """(state, pending input buffer) — lets the PoW grinder simulate
        observe(nonce) -> squeeze on device without mutating the transcript."""
        return list(self.state), list(self.input_buffer)
