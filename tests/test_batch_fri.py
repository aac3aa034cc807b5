"""Shared-FRI batch proving: one FRI ladder attests N statements.

The succinctness substitute for the reference's recursive aggregation
(reference src/fields/fq/circuit.rs:106-108): N statements share one fold
ladder, one PoW and one query phase (stark/batch_prove.py).
"""

import copy

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq_mul import FqMulAir
from starky_bn254_tpu.stark import StarkConfig, prove
from starky_bn254_tpu.stark.batch_prove import (
    BatchStarkProof,
    prove_batch_fri,
    verify_batch_fri,
)
from starky_bn254_tpu.stark.verifier import VerificationError

RNG = np.random.default_rng(21)
N_ROWS = 256
N_STMTS = 3
CFG = StarkConfig.test_config()


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


@pytest.fixture(scope="module")
def batch():
    airs, items = [], []
    for _ in range(N_STMTS):
        air = FqMulAir(N_ROWS)
        trace = air.generate_trace([(rand_fq(), rand_fq()) for _ in range(250)])
        airs.append(air)
        items.append((air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64)))
    proof = prove_batch_fri(items, CFG)
    return airs, proof


def test_batch_roundtrip(batch):
    airs, proof = batch
    assert verify_batch_fri(airs, proof, CFG)


def test_batch_shares_one_fri(batch):
    airs, proof = batch
    assert len(proof.statements) == N_STMTS
    fri = proof.shared_fri
    # the shared rounds open every statement's oracles at the same indices
    # (FqMulAir has aux columns: trace + aux + quotient per statement)
    assert len(fri.query_rounds[0].initial_leaves) == 3 * N_STMTS
    for s in proof.statements[1:]:
        assert len(s.fri.layer_caps) == 0  # only statement 0 carries the FRI


def test_batch_tampered_opening_rejected(batch):
    airs, proof = batch
    bad = copy.deepcopy(proof)
    tz = bad.statements[1].openings.trace_zeta.copy()
    tz[0, 0] = (int(tz[0, 0]) + 1) % ((1 << 64) - (1 << 32) + 1)
    bad.statements[1].openings.trace_zeta = tz
    with pytest.raises(VerificationError):
        verify_batch_fri(airs, bad, CFG)


def test_batch_tampered_cap_rejected(batch):
    airs, proof = batch
    bad = copy.deepcopy(proof)
    cap = bad.statements[2].trace_cap.copy()
    cap[0, 0] ^= 1
    bad.statements[2].trace_cap = cap
    with pytest.raises(VerificationError):
        verify_batch_fri(airs, bad, CFG)


def test_batch_offload_byte_identical(batch, monkeypatch):
    """With the device-LDE budget forced to zero every statement's oracles
    live in HOST memory through the shared FRI (the bounded-retained-state
    path for heavy batches); the proof must be byte-identical to the
    all-on-device run."""
    airs, proof = batch
    monkeypatch.setenv("STARKY_LDE_DEVICE_BYTES", "0")
    items = []
    rng = np.random.default_rng(21)  # same stream as the module fixture

    def rfq():
        return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    for air in airs:
        trace = air.generate_trace([(rfq(), rfq()) for _ in range(250)])
        items.append((air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64)))
    proof2 = prove_batch_fri(items, CFG)
    for s1, s2 in zip(proof.statements, proof2.statements):
        assert np.array_equal(s1.trace_cap, s2.trace_cap)
        assert np.array_equal(s1.quotient_cap, s2.quotient_cap)
        assert np.array_equal(s1.openings.trace_zeta, s2.openings.trace_zeta)
    f1, f2 = proof.shared_fri, proof2.shared_fri
    assert f1.pow_nonce == f2.pow_nonce
    assert np.array_equal(f1.final_coeffs, f2.final_coeffs)
    for q1, q2 in zip(f1.query_rounds, f2.query_rounds):
        for a, b in zip(q1.initial_leaves, q2.initial_leaves):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    assert verify_batch_fri(airs, proof2, CFG)


def test_batch_mixed_heights_roundtrip():
    """DIFFERENT-height statements in one shared FRI (the reference-L6
    "one artifact attesting N different-height statements" gap): a
    1024-row and a 256-row FqMul statement (ratio 4 = one fold layer)
    batch into one ladder; the smaller one commits on coset g^4 and is
    injected at its layer. Verify + tamper rejection on BOTH statements."""
    airs, items = [], []
    rng = np.random.default_rng(51)

    def rfq():
        return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    for rows, n_ops in ((1024, 1000), (256, 250)):
        air = FqMulAir(rows)
        trace = air.generate_trace([(rfq(), rfq()) for _ in range(n_ops)])
        airs.append(air)
        items.append((air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64)))
    proof = prove_batch_fri(items, CFG)
    assert proof.statements[0].degree_bits == 10
    assert proof.statements[1].degree_bits == 8
    assert verify_batch_fri(airs, proof, CFG)

    # tampering the SMALL statement's opening must break the shared ladder
    bad = copy.deepcopy(proof)
    tz = bad.statements[1].openings.trace_zeta.copy()
    tz[0, 0] = (int(tz[0, 0]) + 1) % ((1 << 64) - (1 << 32) + 1)
    bad.statements[1].openings.trace_zeta = tz
    with pytest.raises(VerificationError):
        verify_batch_fri(airs, bad, CFG)
    # and the large statement's cap
    bad2 = copy.deepcopy(proof)
    cap = bad2.statements[0].trace_cap.copy()
    cap[0, 0] ^= 1
    bad2.statements[0].trace_cap = cap
    with pytest.raises(VerificationError):
        verify_batch_fri(airs, bad2, CFG)


def test_batch_mixed_heights_odd_ratio_rejected():
    """Heights off the 4^k grid are refused up front (pad them instead)."""
    rng = np.random.default_rng(53)

    def rfq():
        return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    items = []
    for rows in (1024, 512):  # ratio 2: not a power of ARITY=4
        air = FqMulAir(rows)
        trace = air.generate_trace([(rfq(), rfq()) for _ in range(200)])
        items.append((air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64)))
    with pytest.raises(AssertionError):
        prove_batch_fri(items, CFG)


def test_batch_succinctness(batch):
    """The shared artifact must be materially smaller than N independent
    proofs: layer paths, final poly and PoW are paid once."""
    airs, proof = batch

    def nbytes(p):
        total = 0
        for s in [p] if not isinstance(p, BatchStarkProof) else p.statements:
            total += s.trace_cap.nbytes + s.quotient_cap.nbytes
            if s.z_cap is not None:
                total += s.z_cap.nbytes
            o = s.openings
            for a in (o.trace_zeta, o.trace_gzeta, o.z_zeta, o.z_gzeta, o.quotient_zeta):
                if a is not None:
                    total += a.nbytes
            total += s.fri.final_coeffs.nbytes
            for cap in s.fri.layer_caps:
                total += cap.nbytes
            for qr in s.fri.query_rounds:
                for x in qr.initial_leaves + qr.initial_paths + qr.layer_leaves + qr.layer_paths:
                    total += np.asarray(x).nbytes
        return total

    batch_bytes = nbytes(proof)
    air = airs[0]
    trace = air.generate_trace([(rand_fq(), rand_fq()) for _ in range(250)])
    single = prove(air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64), CFG)
    independent_bytes = N_STMTS * nbytes(single)
    assert batch_bytes < independent_bytes
