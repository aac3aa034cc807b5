"""G1ExpAir: scalar multiplication x*s + offset, prove/verify round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.g1_exp import G1ExpAir
from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

RNG = np.random.default_rng(13)


def rand_scalar():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


def rand_point():
    return bn254.g1_mul(bn254.G1_GEN, rand_scalar())


NUM_IO = 2
CFG = StarkConfig.test_config()


@pytest.fixture(scope="module")
def air_proof():
    air = G1ExpAir(NUM_IO, range_check="split")
    inputs = [(rand_point(), rand_point(), rand_scalar()) for _ in range(NUM_IO)]
    trace, pi = air.generate_trace_and_pi(inputs)
    proof = prove(air, jnp.asarray(trace), pi, CFG)
    return air, proof


def test_trace_oracle():
    # witness generation self-checks against the host scalar-mult oracle
    air = G1ExpAir(1, range_check="split")
    x, off, e = rand_point(), rand_point(), rand_scalar()
    trace, pi = air.generate_trace_and_pi([(x, off, e)])
    assert trace.shape == (512, air.num_columns)
    expect = bn254.g1_add(bn254.g1_mul(x, e), off)
    got_x = sum(int(v) << (32 * k) for k, v in enumerate(pi[40:48]))
    got_y = sum(int(v) << (32 * k) for k, v in enumerate(pi[48:56]))
    assert (got_x, got_y) == expect


def test_roundtrip(air_proof):
    air, proof = air_proof
    assert verify(air, proof, CFG)


def test_forged_output_rejected(air_proof):
    import copy

    air, proof = air_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs = bad.public_inputs.copy()
    bad.public_inputs[40] = (int(bad.public_inputs[40]) + 1) % (1 << 32)
    with pytest.raises(VerificationError):
        verify(air, bad, CFG)
