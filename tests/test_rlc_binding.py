"""RLC IO binding: round-trip plus the PI-substitution attack.

The sharp soundness question for the accumulator binding: can a prover run
the computation for inputs A but present public inputs claiming B? (The
per-instance pulse binding rejects this cell-wise; the RLC binding must
reject it through the challenge-weighted sums.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.g1_exp import G1ExpAir
from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

RNG = np.random.default_rng(67)
CFG = StarkConfig.test_config()


def rs():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


def rp():
    return bn254.g1_mul(bn254.G1_GEN, rs())


@pytest.fixture(scope="module")
def setup():
    air = G1ExpAir(2, range_check="logup", io_binding="rlc")
    inputs = [(rp(), rp(), rs()) for _ in range(2)]
    trace, pi = air.generate_trace_and_pi(inputs)
    proof = prove(air, jnp.asarray(trace), pi, CFG)
    return air, trace, pi, proof, inputs


def test_roundtrip(setup):
    air, _, _, proof, _ = setup
    assert verify(air, proof, CFG)


def test_pi_substitution_attack(setup):
    """Prove with a trace for inputs A while claiming different inputs B in
    the public inputs — the accumulator pins must reject it."""
    air, trace, _, _, _ = setup
    other = [(rp(), rp(), rs()) for _ in range(2)]
    _, forged_pi = air.generate_trace_and_pi(other)
    with pytest.raises(VerificationError):
        p = prove(air, jnp.asarray(trace), forged_pi, CFG)
        verify(air, p, CFG)


def test_swapped_instances_rejected(setup):
    """Swapping two instances' PI blocks changes the delta-weights: reject."""
    air, trace, pi, _, _ = setup
    swapped = pi.copy()
    L = air.num_public_inputs // 2
    swapped[:L], swapped[L:] = pi[L:].copy(), pi[:L].copy()
    with pytest.raises(VerificationError):
        p = prove(air, jnp.asarray(trace), swapped, CFG)
        verify(air, p, CFG)
