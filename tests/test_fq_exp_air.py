"""FqExpAir: the reference's test_fq_exp_raw equivalent at small batch size
(our split range check lifts the num_io >= 128 floor; the full-size config is
exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq_exp import FqExpAir
from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

RNG = np.random.default_rng(11)


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


def rand_fr():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


NUM_IO = 2
CFG = StarkConfig.test_config()


@pytest.fixture(scope="module")
def air_proof():
    air = FqExpAir(NUM_IO, range_check="split")
    inputs = [(rand_fq(), rand_fq(), rand_fr()) for _ in range(NUM_IO)]
    trace, pi = air.generate_trace_and_pi(inputs)
    proof = prove(air, jnp.asarray(trace), pi, CFG)
    return air, proof, inputs


def test_roundtrip(air_proof):
    air, proof, _ = air_proof
    assert verify(air, proof, CFG)


def test_public_io_binds_output(air_proof):
    import copy

    air, proof, _ = air_proof
    bad = copy.deepcopy(proof)
    # claim a different result for instance 0
    bad.public_inputs = bad.public_inputs.copy()
    bad.public_inputs[24] = (int(bad.public_inputs[24]) + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, bad, CFG)
