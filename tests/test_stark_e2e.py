"""End-to-end STARK prove/verify round-trip on a small synthetic AIR.

Exercises every constraint kind (first/last/transition/cyclic), public
inputs, and the permutation argument, before the heavyweight BN254 AIRs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from starky_bn254_tpu import goldilocks as gl
from starky_bn254_tpu.stark.air import Air
from starky_bn254_tpu.stark.config import StarkConfig
from starky_bn254_tpu.stark.prover import prove
from starky_bn254_tpu.stark.verifier import VerificationError, verify


class SquareChainAir(Air):
    """cols: [counter, x, counter_reversed]
    - counter: 0,1,2,...  (first/transition/last constraints)
    - x: x_{i+1} = x_i^2 + 1, x_0 = 2; last x pinned to public input
    - counter_reversed: multiset-equal to counter (permutation argument)
    """

    num_columns = 3
    num_public_inputs = 1

    def __init__(self, n: int):
        self.n = n

    def permutation_pairs(self):
        return [(0, 2)]

    def eval(self, lv, nv, pi, cc):
        c = lv.col(0)
        cn = nv.col(0)
        x = lv.col(1)
        xn = nv.col(1)
        cc.constraint_first_row(c)
        cc.constraint_transition(cn - c - 1)
        cc.constraint_last_row(c - (self.n - 1))
        cc.constraint_first_row(x - 2)
        cc.constraint_transition(xn - x * x - 1)
        cc.constraint_last_row(x - pi.col(0))

    def generate_trace(self):
        n = self.n
        counter = np.arange(n, dtype=np.uint64)
        x = np.empty(n, dtype=np.uint64)
        v = 2
        for i in range(n):
            x[i] = v
            v = (v * v + 1) % gl.P
        trace = np.stack([counter, x, counter[::-1]], axis=1)
        pi = np.array([x[-1]], dtype=np.uint64)
        return jnp.asarray(trace), pi


N = 32
AIR = SquareChainAir(N)
CFG = StarkConfig.test_config()


@pytest.fixture(scope="module")
def proof():
    trace, pi = AIR.generate_trace()
    return prove(AIR, trace, pi, CFG)


def test_roundtrip(proof):
    assert verify(AIR, proof, CFG)


def test_tampered_public_input_fails(proof):
    import copy

    bad = copy.deepcopy(proof)
    bad.public_inputs = bad.public_inputs.copy()
    bad.public_inputs[0] ^= 1
    with pytest.raises(VerificationError):
        verify(AIR, bad, CFG)


def test_tampered_opening_fails(proof):
    import copy

    bad = copy.deepcopy(proof)
    bad.openings.trace_zeta = bad.openings.trace_zeta.copy()
    bad.openings.trace_zeta[1, 0] ^= 1
    with pytest.raises(VerificationError):
        verify(AIR, bad, CFG)


def test_tampered_cap_fails(proof):
    import copy

    bad = copy.deepcopy(proof)
    bad.trace_cap = bad.trace_cap.copy()
    bad.trace_cap[0, 0] ^= 1
    with pytest.raises(VerificationError):
        verify(AIR, bad, CFG)


def test_wrong_trace_fails():
    # break the multiset equality: counter_reversed column tampered
    trace, pi = AIR.generate_trace()
    bad_trace = np.asarray(trace).copy()
    bad_trace[3, 2] = (int(bad_trace[3, 2]) + 1) % gl.P
    with pytest.raises(VerificationError):
        p = prove(AIR, jnp.asarray(bad_trace), pi, CFG)
        verify(AIR, p, CFG)


def test_proof_serialization_roundtrip(proof, tmp_path):
    from starky_bn254_tpu.stark.proof import load_proof, save_proof

    path = str(tmp_path / "proof.npz")
    save_proof(path, proof)
    loaded = load_proof(path)
    assert verify(AIR, loaded, CFG)


def test_prove_pipelined_matches_sequential():
    """prove_pipelined overlaps tracegen with proving but must produce the
    exact proofs sequential prove() calls do."""
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import prove, prove_pipelined

    rng = np.random.default_rng(5)

    def fq():
        return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    air = FqMulAir(256)
    batches = [[(fq(), fq()) for _ in range(250)] for _ in range(3)]
    # FqMulAir has no public inputs; generate_trace returns only the trace
    import types

    if not hasattr(air, "generate_trace_and_pi"):
        air.generate_trace_and_pi = types.MethodType(
            lambda self, ins: (self.generate_trace(ins), np.zeros(0, dtype=np.uint64)),
            air,
        )
    from starky_bn254_tpu.stark.proof import proof_to_bytes

    pipelined = prove_pipelined(air, batches, CFG)
    for inputs, got in zip(batches, pipelined):
        trace, pi = air.generate_trace_and_pi(inputs)
        want = prove(air, jnp.asarray(trace), pi, CFG)
        assert proof_to_bytes(got) == proof_to_bytes(want)
