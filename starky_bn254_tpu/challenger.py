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


class Challenger:
    def __init__(self):
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
        for x in np.asarray(xs, dtype=np.uint64).reshape(-1):
            self.observe_element(int(x))

    def observe_cap(self, cap):
        self.observe_elements(np.asarray(cap, dtype=np.uint64))

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
        assert domain_size & (domain_size - 1) == 0
        return [self.get_challenge() & (domain_size - 1) for _ in range(n_queries)]
