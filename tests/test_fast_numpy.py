"""Fast tier: the pure-numpy engine paths, runnable in seconds.

`python -m pytest tests/test_fast_numpy.py -q` is the sub-minute inner loop
(VERDICT r2 item 10): it exercises the xnp-numpy side of the dual-engine
field ops, the host challenger, the eager constraint replay, the FRI fold
math and a full verifier run on a checked-in proof fixture — without
compiling any prover graph. The only jit work is the tiny Merkle batch
checks inside verify (cached after first run).

The fixture (tests/fixtures/fq_mul_256_test_config.npz) is a real FqMulAir
proof; regenerate with scripts/gen_fast_fixture.py after any transcript or
layout change (same policy as the determinism goldens).
"""

import os

import numpy as np
import pytest

from starky_bn254_tpu import goldilocks as gl
from starky_bn254_tpu.challenger import Challenger

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "fq_mul_256_test_config.npz"
)


# -- field ops vs exact Python ints -------------------------------------------


def _rand_u64(rng, shape):
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64)


def test_numpy_field_ops_match_python_ints():
    rng = np.random.default_rng(3)
    a = _rand_u64(rng, (257,))
    b = _rand_u64(rng, (257,))
    with np.errstate(over="ignore"):
        got_add = gl.add(a, b)
        got_sub = gl.sub(a, b)
        got_mul = gl.mul(a, b)
    assert isinstance(got_mul, np.ndarray)  # numpy-in -> numpy-out
    for i in range(0, 257, 17):
        ai, bi = int(a[i]), int(b[i])
        assert int(got_add[i]) == (ai + bi) % gl.P
        assert int(got_sub[i]) == (ai - bi) % gl.P
        assert int(got_mul[i]) == (ai * bi) % gl.P


def test_numpy_ext_ops_match_python_ints():
    rng = np.random.default_rng(4)
    a = _rand_u64(rng, (63, 2))
    b = _rand_u64(rng, (63, 2))
    with np.errstate(over="ignore"):
        got = gl.ext_mul(a, b)
        inv = gl.ext_inv(a)
        prod = gl.ext_mul(a, inv)
    for i in range(0, 63, 7):
        a0, a1, b0, b1 = (int(a[i, 0]), int(a[i, 1]), int(b[i, 0]), int(b[i, 1]))
        c0 = (a0 * b0 + gl.W * a1 * b1) % gl.P
        c1 = (a0 * b1 + a1 * b0) % gl.P
        assert (int(got[i, 0]), int(got[i, 1])) == (c0, c1)
        assert (int(prod[i, 0]), int(prod[i, 1])) == (1, 0)


def test_numpy_sum_mod_and_powers():
    rng = np.random.default_rng(5)
    x = _rand_u64(rng, (100, 3))
    with np.errstate(over="ignore"):
        s = gl.sum_mod(x, axis=0)
        p = gl.powers_vec(np.array([12345], dtype=np.uint64), 50)
    assert int(s[0]) == sum(int(v) for v in x[:, 0]) % gl.P
    assert [int(v) for v in p[:4]] == [1, 12345, 12345**2 % gl.P, 12345**3 % gl.P]
    assert isinstance(p, np.ndarray)


# -- host challenger ----------------------------------------------------------


def test_challenger_runs_on_host():
    ch = Challenger()
    ch.observe_element(7)
    c = ch.get_challenge()
    assert isinstance(c, int) and 0 <= c < gl.P
    ch2 = Challenger()
    ch2.observe_element(7)
    assert ch2.get_challenge() == c


# -- FRI fold + query math (host numpy) --------------------------------------


def test_pow_per_query_numpy():
    from starky_bn254_tpu.stark.fri import _pow_per_query

    exps = np.array([0, 1, 5, 1023], dtype=np.int64)
    with np.errstate(over="ignore"):
        got = _pow_per_query(3, exps, 1024)
    assert isinstance(got, np.ndarray)
    assert [int(v) for v in got] == [pow(3, int(e), gl.P) for e in exps]


def test_dft4_fold_numpy():
    from starky_bn254_tpu.stark.fri import I_UNIT, _dft4_terms

    rng = np.random.default_rng(6)
    vs = [_rand_u64(rng, (8, 2)) for _ in range(4)]
    with np.errstate(over="ignore"):
        a0, a1, a2, a3 = _dft4_terms(*vs)
    assert isinstance(a0, np.ndarray)
    # a0 is the plain sum, a2 the alternating sum
    i = 3
    want0 = sum(int(v[i, 0]) for v in vs) % gl.P
    assert int(a0[i, 0]) == want0
    want2 = (int(vs[0][i, 0]) - int(vs[1][i, 0]) + int(vs[2][i, 0]) - int(vs[3][i, 0])) % gl.P
    assert int(a2[i, 0]) == want2
    assert I_UNIT * I_UNIT % gl.P == gl.P - 1


# -- gadget eval on numpy scalars --------------------------------------------


def test_gadget_eval_numpy_engine():
    """The polymorphic Val/RowView layer runs eagerly on numpy rows."""
    from starky_bn254_tpu.stark.consumer import ConstraintConsumer
    from starky_bn254_tpu.stark.field_expr import Val

    a = Val(np.array([5, 0], dtype=np.uint64), True)
    b = Val(np.array([7, 0], dtype=np.uint64), True)
    cc = ConstraintConsumer(
        [Val(np.array([1, 0], dtype=np.uint64), True)],
        z_last=Val(np.array([1, 0], dtype=np.uint64), True),
        l_first=Val(np.array([0, 0], dtype=np.uint64), True),
        l_last=Val(np.array([0, 0], dtype=np.uint64), True),
    )
    with np.errstate(over="ignore"):
        prod = a * b - 35
        cc.constraint(prod)
        acc = cc.final_accs()[0]
    assert int(np.asarray(acc.arr).reshape(-1)[0]) == 0


# -- full verifier on the checked-in fixture ----------------------------------


@pytest.fixture(scope="module")
def fixture_proof():
    from starky_bn254_tpu.stark import load_proof

    assert os.path.exists(FIXTURE), "run scripts/gen_fast_fixture.py"
    return load_proof(FIXTURE)


def test_verify_fixture(fixture_proof):
    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import StarkConfig, verify

    air = FqMulAir(256)
    assert verify(air, fixture_proof, StarkConfig.test_config())


def test_fixture_tamper_rejected(fixture_proof):
    import copy

    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import StarkConfig, verify
    from starky_bn254_tpu.stark.verifier import VerificationError

    air = FqMulAir(256)
    bad = copy.deepcopy(fixture_proof)
    bad.openings.trace_zeta = bad.openings.trace_zeta.copy()
    bad.openings.trace_zeta[0, 0] = (int(bad.openings.trace_zeta[0, 0]) + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(air, bad, StarkConfig.test_config())


def test_fixture_bytes_roundtrip(fixture_proof):
    from starky_bn254_tpu.stark.proof import proof_from_bytes, proof_to_bytes

    blob = proof_to_bytes(fixture_proof)
    assert proof_to_bytes(proof_from_bytes(blob)) == blob


def test_pallas_xla_only_guard():
    """The xla_only() context must disable Pallas dispatch (used around
    shard_map bodies, where pallas_call's un-annotated out_shapes trip
    check_vma) and restore it on exit, including nested use."""
    from starky_bn254_tpu import pallas

    assert not pallas.xla_only_active()
    with pallas.xla_only():
        assert pallas.xla_only_active()
        with pallas.xla_only():
            assert pallas.xla_only_active()
        assert pallas.xla_only_active()
    assert not pallas.xla_only_active()
