"""Merkle tree with cap, batched leaf hashing, TPU-first layout.

Replaces the plonky2 `MerkleTree`/`MerkleCap` the reference gets from its L1
fork (SURVEY.md 2b). Leaves are rows of a [n_leaves, width] matrix (one leaf
per LDE-domain point, all committed columns at that point), hashed with the
overwrite-mode Poseidon sponge; internal levels are batched two-to-one
compressions. The tree stops `cap_height` levels early, yielding a cap of
2^cap_height digests (the commitment).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import poseidon


@dataclass
class MerkleTree:
    """All levels kept on device for O(1) gather-based proof extraction.

    levels[0]: leaf digests [n, 4]; levels[-1]: cap [2^cap_height, 4].
    """

    levels: list[jnp.ndarray]
    cap_height: int

    @property
    def cap(self) -> jnp.ndarray:
        return self.levels[-1]

    def prove(self, index: int) -> jnp.ndarray:
        """Merkle path (sibling digests, bottom-up) for a leaf index.

        Returns [path_len, 4]; path stops at the cap.
        """
        sibs = []
        idx = index
        for level in self.levels[:-1]:
            sibs.append(level[idx ^ 1])
            idx >>= 1
        if not sibs:
            return jnp.zeros((0, 4), dtype=jnp.uint64)
        return jnp.stack(sibs)

    def prove_batch(self, indices) -> jnp.ndarray:
        """Merkle paths for MANY leaf indices in ONE jitted dispatch.

        Returns [Q, path_len, 4]. The FRI query phase extracts 84+ paths;
        per-query `prove` costs thousands of eager device round trips on
        the tunneled-TPU path and even per-LEVEL eager gathers cost ~30
        round trips per tree (measured 677 ms of query extraction);
        the jitted whole-tree gather costs one.
        """
        idx = jnp.asarray(indices, dtype=jnp.int64)
        if len(self.levels) == 1:
            return jnp.zeros((idx.shape[0], 0, 4), dtype=jnp.uint64)
        return _prove_batch_jit(idx, tuple(self.levels[:-1]))


import functools


@jax.jit
def _prove_batch_jit(idx, levels):
    """Sibling-path gathers for all levels below the cap in one program."""
    sibs = []
    for level in levels:
        sibs.append(level[idx ^ 1])  # [Q, 4]
        idx = idx >> 1
    return jnp.stack(sibs, axis=1)


@functools.partial(jax.jit, static_argnames=("cap_height", "hasher"))
def _build_levels(leaves: jnp.ndarray, cap_height: int, hasher: str = "poseidon"):
    """All tree levels in ONE compiled graph (remote compiles are expensive;
    per-level dispatch would cost one compile per level shape)."""
    from .hashing import get_hasher

    h = get_hasher(hasher)
    digests = h.hash_or_noop(leaves)
    levels = [digests]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(h.compress(cur[0::2], cur[1::2]))
    return tuple(levels)


@functools.partial(jax.jit, static_argnames=("hasher",))
def _leaf_digests(leaves: jnp.ndarray, hasher: str = "poseidon") -> jnp.ndarray:
    from .hashing import get_hasher

    return get_hasher(hasher).hash_or_noop(leaves)


@functools.partial(jax.jit, static_argnames=("cap_height", "hasher"))
def _upper_levels(digests: jnp.ndarray, cap_height: int, hasher: str = "poseidon"):
    from .hashing import get_hasher

    h = get_hasher(hasher)
    levels = [digests]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(h.compress(cur[0::2], cur[1::2]))
    return tuple(levels[1:])


# Above this many leaf CELLS the tree is built in row blocks: leaf digests
# are independent per row, so hashing [2^18-row] slices in separate
# dispatches (one compiled executable reused across blocks) bounds the
# graph's working set. The single whole-tree graph OOM'd the chip at
# [2^20, 404] even though the arrays themselves fit.
_BLOCK_CELLS = 1 << 26
_BLOCK_ROWS_MIN = 1 << 15


def build_merkle_tree(
    leaves: jnp.ndarray, cap_height: int, hasher: str = "poseidon"
) -> MerkleTree:
    """leaves: [n, width] uint64; n must be a power of two >= 2^cap_height.
    hasher: hashing.py registry name (FriConfig.merkle_hash)."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0
    assert 1 << cap_height <= n
    width = leaves.shape[1] if leaves.ndim > 1 else 1
    if n * width <= _BLOCK_CELLS or width <= 4:
        levels = list(_build_levels(leaves, cap_height, hasher))
        return MerkleTree(levels=levels, cap_height=cap_height)
    row_block = max(_BLOCK_CELLS // width, _BLOCK_ROWS_MIN)
    row_block = 1 << (row_block.bit_length() - 1)  # power of two
    parts = []
    for i in range(0, n, row_block):
        d = _leaf_digests(leaves[i : i + row_block], hasher)
        # sync per block: unbounded async enqueue reserves every block
        # program's temp buffers at once (see stark/prover.py _SYNC_CELLS;
        # hard_sync because block_until_ready does not wait over the tunnel)
        from .xnp import hard_sync

        hard_sync(d)
        parts.append(d)
    digests = jnp.concatenate(parts)
    levels = [digests] + list(_upper_levels(digests, cap_height, hasher))
    return MerkleTree(levels=levels, cap_height=cap_height)


def verify_merkle_proof(
    leaf_data: jnp.ndarray,
    index: int,
    path: jnp.ndarray,
    cap: jnp.ndarray,
    hasher: str = "poseidon",
) -> bool:
    """Check a leaf (raw row values) against a cap. Host-side helper."""
    from .hashing import get_hasher

    h = get_hasher(hasher)
    digest = h.hash_or_noop(leaf_data)
    idx = index
    for i in range(path.shape[0]):
        sib = path[i]
        if idx & 1:
            digest = h.compress(sib, digest)
        else:
            digest = h.compress(digest, sib)
        idx >>= 1
    expected = cap[idx]
    return bool(jax.device_get((digest == expected).all()))
