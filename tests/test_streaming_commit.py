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
