"""The streaming column-blocked commit must be bit-identical to the
monolithic path (same LDE, same tree levels, same cap), and the 1-list
ownership-transfer form must behave like a plain array argument."""

import jax.numpy as jnp
import numpy as np

from starky_bn254_tpu.stark import prover
from starky_bn254_tpu.stark.config import StarkConfig


def test_streaming_commit_bit_identical():
    cfg = StarkConfig.test_config()
    rng = np.random.default_rng(2)
    # 68 cols: 8 full RATE-blocks + a 4-wide padded tail chunk
    vals = jnp.asarray(rng.integers(0, 1 << 16, size=(512, 68), dtype=np.uint64))
    mono = prover.commit(vals, cfg)
    stream = prover._commit_streaming(vals, cfg)
    assert (np.asarray(mono.lde) == np.asarray(stream.lde)).all()
    assert len(mono.tree.levels) == len(stream.tree.levels)
    for a, b in zip(mono.tree.levels, stream.tree.levels):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_commit_ownership_list_form():
    cfg = StarkConfig.test_config()
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.integers(0, 1 << 16, size=(256, 24), dtype=np.uint64))
    plain = prover.commit(vals, cfg)
    holder = [vals]
    owned = prover.commit(holder, cfg)
    assert holder == []  # ownership consumed
    assert (np.asarray(plain.tree.cap) == np.asarray(owned.tree.cap)).all()


def test_streaming_commit_bit_identical_keccak(monkeypatch):
    """Same pin under the Keccak Merkle hasher: the streaming absorb +
    finalize(tail) chain must reproduce the monolithic hash_no_pad digests
    exactly (keccak pads the final block, so the tail handling differs from
    poseidon's zero-pad overwrite — this is the path the keccak north-star
    and offload proves ride)."""
    import dataclasses

    cfg = StarkConfig.test_config()
    cfg = dataclasses.replace(
        cfg, fri=dataclasses.replace(cfg.fri, merkle_hash="keccak")
    )
    rng = np.random.default_rng(4)
    # force RATE-wide column blocks so the absorb chains across 4 blocks
    # (3 full keccak RATE-blocks of 17 + an 8-wide tail in the last)
    monkeypatch.setenv("STARKY_COMMIT_BLOCK_CELLS", str(17 * 1024))
    vals = jnp.asarray(rng.integers(0, 1 << 16, size=(512, 59), dtype=np.uint64))
    mono = prover.commit(vals, cfg)
    stream = prover._commit_streaming(vals, cfg)
    for a, b in zip(mono.tree.levels, stream.tree.levels):
        assert (np.asarray(a) == np.asarray(b)).all()
    # and the host-offload flavor (numpy LDE buffer) stays identical too
    offl = prover._commit_streaming(vals, cfg, offload=True)
    assert isinstance(offl.lde, np.ndarray)
    assert (np.asarray(mono.lde) == offl.lde).all()
    for a, b in zip(mono.tree.levels, offl.tree.levels):
        assert (np.asarray(a) == np.asarray(b)).all()
