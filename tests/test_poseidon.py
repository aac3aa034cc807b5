"""Poseidon / Merkle / challenger tests."""

import numpy as np

from starky_bn254_tpu import challenger as ch
from starky_bn254_tpu import goldilocks as gl
from starky_bn254_tpu import merkle, poseidon

RNG = np.random.default_rng(2)


def rand_elems(shape):
    flat = [int(RNG.integers(0, 1 << 62)) % gl.P for _ in range(int(np.prod(shape)))]
    return np.array(flat, dtype=np.uint64).reshape(shape)


def test_permute_host_device_match():
    state = rand_elems((poseidon.WIDTH,))
    dev = np.asarray(poseidon.permute(gl.u64(state)))
    host = ch._permute_host([int(x) for x in state])
    assert [int(x) for x in dev] == host


def test_permute_batched_consistent():
    states = rand_elems((5, poseidon.WIDTH))
    batched = np.asarray(poseidon.permute(gl.u64(states)))
    for i in range(5):
        single = np.asarray(poseidon.permute(gl.u64(states[i])))
        assert np.array_equal(batched[i], single)


def test_permute_not_identity_and_deterministic():
    state = rand_elems((poseidon.WIDTH,))
    a = np.asarray(poseidon.permute(gl.u64(state)))
    b = np.asarray(poseidon.permute(gl.u64(state)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, state)


def test_hash_no_pad_multi_chunk():
    # 10 elements = chunk of 8 + chunk of 2; check against manual spongeing
    data = rand_elems((10,))
    got = np.asarray(poseidon.hash_no_pad(gl.u64(data)))
    state = [0] * poseidon.WIDTH
    state[:8] = [int(x) for x in data[:8]]
    state = ch._permute_host(state)
    # final partial chunk is zero-padded to the full rate (overwrite mode)
    state[:8] = [int(x) for x in data[8:]] + [0] * 6
    state = ch._permute_host(state)
    assert [int(x) for x in got] == state[:4]


def test_merkle_tree_and_proofs():
    leaves = rand_elems((32, 7))
    tree = merkle.build_merkle_tree(gl.u64(leaves), cap_height=2)
    assert tree.cap.shape == (4, 4)
    for idx in [0, 5, 31]:
        path = tree.prove(idx)
        assert path.shape == (3, 4)  # 5 levels - 2 cap levels
        ok = merkle.verify_merkle_proof(gl.u64(leaves[idx]), idx, path, tree.cap)
        assert ok
    # tampered leaf fails
    bad = leaves[5].copy()
    bad[0] ^= 1
    assert not merkle.verify_merkle_proof(gl.u64(bad), 5, tree.prove(5), tree.cap)


def test_challenger_determinism_and_sensitivity():
    def run(vals):
        c = ch.Challenger()
        c.observe_elements(np.array(vals, dtype=np.uint64))
        return c.get_n_challenges(4)

    a = run([1, 2, 3])
    b = run([1, 2, 3])
    c = run([1, 2, 4])
    assert a == b
    assert a != c
    assert all(0 <= x < gl.P for x in a)


def test_challenger_interleaved_observe():
    c1 = ch.Challenger()
    c1.observe_elements(np.array([7, 8], dtype=np.uint64))
    x1 = c1.get_challenge()
    c1.observe_element(9)
    y1 = c1.get_challenge()

    c2 = ch.Challenger()
    c2.observe_elements(np.array([7, 8], dtype=np.uint64))
    x2 = c2.get_challenge()
    c2.observe_element(9)
    y2 = c2.get_challenge()
    assert (x1, y1) == (x2, y2)
    assert x1 != y1


def test_challenger_vector_digest_path():
    """Vectors >= VECTOR_OBSERVE_MIN are absorbed as a batched tree digest;
    the path must be deterministic, value- and length-sensitive, and disjoint
    from the element-wise path."""
    n = ch.VECTOR_OBSERVE_MIN + 37
    vals = np.arange(n, dtype=np.uint64)

    def run(v):
        c = ch.Challenger()
        c.observe_elements(v)
        return c.get_n_challenges(3)

    assert run(vals) == run(vals.copy())
    tampered = vals.copy()
    tampered[-1] += 1
    assert run(vals) != run(tampered)
    # length sensitivity: zero-extension must change the transcript
    assert run(vals) != run(np.concatenate([vals, np.zeros(1, np.uint64)]))
    # chunked observes of a large vector are NOT equivalent to one observe
    # (the digest binds the whole vector); both are self-consistent though
    c = ch.Challenger()
    c.observe_elements(vals[: n // 2])
    c.observe_elements(vals[n // 2 :])
    assert c.get_n_challenges(3) != run(vals)


def test_poseidon_constants_swap_roundtrip():
    """The parameter set is swappable end-to-end (the future plonky2
    transcript-parity hook): proofs made under set A verify under A, are
    REJECTED under set B, and the whole pipeline round-trips under B."""
    import jax.numpy as jnp
    import pytest as _pytest

    from starky_bn254_tpu import bn254, poseidon
    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

    rng = np.random.default_rng(29)
    fq = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.P_BN
    air = FqMulAir(256)
    trace = air.generate_trace([(fq(), fq()) for _ in range(100)])
    pi = np.zeros(0, dtype=np.uint64)
    cfg = StarkConfig.test_config()

    proof_a = prove(air, jnp.asarray(trace), pi, cfg)
    assert verify(air, proof_a, cfg)
    try:
        poseidon.set_params(seed=b"starky_bn254_tpu/poseidon/ALT-SET/v2")
        # set-A proof must not verify under set B
        with _pytest.raises(VerificationError):
            verify(air, proof_a, cfg)
        # and the full pipeline is self-consistent under set B
        proof_b = prove(air, jnp.asarray(trace), pi, cfg)
        assert verify(air, proof_b, cfg)
        assert not np.array_equal(proof_a.trace_cap, proof_b.trace_cap)
    finally:
        poseidon.set_params(seed=poseidon._DEFAULT_SEED)
    assert verify(air, proof_a, cfg)  # defaults restored


def _plonky2_shaped_params(rng):
    """A synthetic RAW [30][12] round-constant table plus plonky2's actual
    circulant+diagonal MDS shape (its published MDS_MATRIX_CIRC /
    MDS_MATRIX_DIAG — non-power-of-two entries, so this exercises the
    multiply MDS form end-to-end). The rc table is synthetic: the fork's
    own table drops in identically once extracted (VERDICT r3 item 4)."""
    n_rounds = poseidon.FULL_ROUNDS + poseidon.PARTIAL_ROUNDS
    rc = (rng.integers(0, 1 << 63, size=(n_rounds, poseidon.WIDTH)).astype(
        np.uint64
    )) % np.uint64(gl.P)
    circ = (17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20)
    diag = (8,) + (0,) * 11
    return rc, circ, diag


def test_poseidon_raw_table_and_circ_diag_mds():
    """set_params(rc_table=..., mds_row=..., mds_diag=...) with arbitrary
    raw constants and plonky2's circ+diag MDS shape: host (dense) and
    device (mul16 split-multiply) permutations must agree, and a PARITY-
    mode proof must round-trip under the swapped set."""
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import StarkConfig, prove, verify
    from starky_bn254_tpu.stark.config import FriConfig

    rng = np.random.default_rng(31)
    rc, circ, diag = _plonky2_shaped_params(rng)
    try:
        poseidon.set_params(rc_table=rc, mds_row=circ, mds_diag=diag)
        assert poseidon._mds_form() == "mul16"
        # the ingested table is used verbatim
        got_rc, dense = poseidon._constants()
        assert np.array_equal(got_rc, rc)
        # dense form really is circ + diag
        assert int(dense[0, 0]) == circ[0] + diag[0]
        assert int(dense[3, 3]) == circ[0] + diag[3]
        assert int(dense[2, 5]) == circ[3]
        # host (dense python) vs device (mul16 split) permutation agree
        state = rand_elems((poseidon.WIDTH,))
        dev = np.asarray(poseidon.permute(gl.u64(state)))
        host = ch._permute_host([int(x) for x in state])
        assert [int(x) for x in dev] == host
        # parity-mode proof round-trips under the swapped parameter set
        rng2 = np.random.default_rng(33)
        fq = lambda: int.from_bytes(rng2.bytes(40), "little") % bn254.P_BN
        air = FqMulAir(256)
        trace = air.generate_trace([(fq(), fq()) for _ in range(64)])
        cfg = StarkConfig(
            num_challenges=2,
            fri=FriConfig(
                rate_bits=1,
                cap_height=1,
                proof_of_work_bits=4,
                num_query_rounds=12,
                final_poly_bits=3,
                parity=True,
            ),
        )
        pi = np.zeros(0, dtype=np.uint64)
        proof = prove(air, jnp.asarray(trace), pi, cfg)
        assert verify(air, proof, cfg)
    finally:
        poseidon.set_params(
            seed=poseidon._DEFAULT_SEED,
            rc_table=None,
            mds_row=(1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024),
            mds_diag=(0,) * 12,
        )
    assert poseidon._mds_form() == "shift"
