"""Keccak-f[1600] Merkle hasher: FIPS-202 pinning, engine duality, streaming
identity, and a full prove/verify round-trip under FriConfig
(merkle_hash="keccak") — the KeccakGoldilocksConfig analogue (plonky2
config.rs; the reference pins Poseidon only for its recursion layer)."""

import dataclasses
import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import keccak, merkle
from starky_bn254_tpu.stark import StarkConfig, prove, verify

RNG = np.random.default_rng(11)


def _keccak_cfg():
    cfg = StarkConfig.test_config()
    return dataclasses.replace(
        cfg, fri=dataclasses.replace(cfg.fri, merkle_hash="keccak")
    )


def test_sha3_256_matches_hashlib():
    """Covers all 24 round constants, every rotation offset and the lane
    indexing in one equality per message (incl. both padding branches)."""
    for msg in [b"", b"abc", b"a" * 135, b"b" * 136, b"c" * 137, b"d" * 1000]:
        assert keccak.sha3_256(msg) == hashlib.sha3_256(msg).digest(), msg[:8]


def test_engine_duality_and_streaming():
    x = RNG.integers(0, 1 << 64, size=(16, 55), dtype=np.uint64)
    dn = keccak.hash_no_pad(x)
    dj = np.asarray(keccak.hash_no_pad(jnp.asarray(x)))
    assert (dn == dj).all()
    # streaming absorb (RATE-aligned prefix) + finalize(tail) == one-shot
    full = 55 // keccak.RATE * keccak.RATE
    st = keccak.sponge_absorb(np.zeros((16, keccak.WIDTH), np.uint64), x[:, :full])
    assert (keccak.finalize(st, x[:, full:]) == dn).all()
    # exact-rate-multiple width: padding adds a whole extra block
    y = x[:, : 2 * keccak.RATE]
    st = keccak.sponge_absorb(np.zeros((16, keccak.WIDTH), np.uint64), y)
    assert (keccak.finalize(st) == keccak.hash_no_pad(y)).all()
    # width-sensitivity: trailing zeros change the digest (10*1 padding)
    z = np.concatenate([x, np.zeros((16, 1), np.uint64)], axis=1)
    assert (keccak.hash_no_pad(z) != dn).any()
    # compress duality
    c_np = keccak.compress(dn, dn[::-1])
    c_jx = np.asarray(keccak.compress(jnp.asarray(dn), jnp.asarray(dn[::-1])))
    assert (c_np == c_jx).all()


def test_merkle_tree_keccak_roundtrip():
    leaves = RNG.integers(0, 1 << 64, size=(64, 21), dtype=np.uint64)
    tree = merkle.build_merkle_tree(jnp.asarray(leaves), 2, hasher="keccak")
    for idx in [0, 13, 63]:
        path = tree.prove(idx)
        assert merkle.verify_merkle_proof(
            jnp.asarray(leaves[idx]), idx, path, tree.cap, hasher="keccak"
        )
        # a poseidon-built verification must fail on the same data
        assert not merkle.verify_merkle_proof(
            jnp.asarray(leaves[idx]), idx, path, tree.cap, hasher="poseidon"
        )


@pytest.fixture(scope="module")
def fq_mul_setup():
    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.fq_mul import FqMulAir

    def rand_fq():
        return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN

    air = FqMulAir(256)
    trace = air.generate_trace([(rand_fq(), rand_fq()) for _ in range(253)])
    return air, trace


def test_prove_verify_keccak(fq_mul_setup):
    air, trace = fq_mul_setup
    cfg = _keccak_cfg()
    pi = np.zeros(0, dtype=np.uint64)
    proof = prove(air, jnp.asarray(trace), pi, cfg)
    assert verify(air, proof, cfg)
    # the SAME proof must fail under the poseidon config: the Merkle caps
    # (and therefore the transcript) bind the hash choice
    ok = True
    try:
        ok = verify(air, proof, StarkConfig.test_config())
    except Exception:
        ok = False
    assert not ok


def test_tamper_rejected_keccak(fq_mul_setup):
    air, trace = fq_mul_setup
    cfg = _keccak_cfg()
    pi = np.zeros(0, dtype=np.uint64)
    proof = prove(air, jnp.asarray(trace), pi, cfg)
    tz = np.array(proof.openings.trace_zeta, dtype=np.uint64)  # writable copy
    flat = tz.reshape(-1)
    flat[0] = np.uint64((int(flat[0]) + 1) % ((1 << 64) - (1 << 32) + 1))
    proof.openings.trace_zeta = tz
    ok = True
    try:
        ok = verify(air, proof, cfg)
    except Exception:
        ok = False
    assert not ok


def test_challenger_accepts_noncanonical_cap_words():
    """Keccak cap digests are uniform u64 — one word in ~2^32 lands >= p.
    observe_cap must reduce deterministically instead of tripping the
    canonicality assert (challenger.py observe_cap)."""
    from starky_bn254_tpu import goldilocks as gl
    from starky_bn254_tpu.challenger import Challenger

    big = np.array([[gl.P + 5, 0xFFFFFFFFFFFFFFFF, 1, 2]], dtype=np.uint64)
    a, b = Challenger(), Challenger()
    a.observe_cap(big)
    b.observe_cap(big % np.uint64(gl.P))
    assert a.get_n_challenges(4) == b.get_n_challenges(4)
