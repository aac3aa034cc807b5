"""FqMulAir: witness generation + full prove/verify round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq_mul import FqMulAir
from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

RNG = np.random.default_rng(7)


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


N_ROWS = 256
CFG = StarkConfig.test_config()


@pytest.fixture(scope="module")
def air_and_proof():
    air = FqMulAir(N_ROWS)
    inputs = [(rand_fq(), rand_fq()) for _ in range(N_ROWS - 3)]  # + 3 pad rows
    trace = air.generate_trace(inputs)
    proof = prove(air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64), CFG)
    return air, proof


def test_roundtrip(air_and_proof):
    air, proof = air_and_proof
    assert verify(air, proof, CFG)


def test_bad_witness_rejected():
    air = FqMulAir(N_ROWS)
    inputs = [(rand_fq(), rand_fq()) for _ in range(8)]
    trace = air.generate_trace(inputs)
    # forge the output of row 0 (and keep limbs in range)
    trace = trace.copy()
    trace[0, 2 * 16] = (int(trace[0, 2 * 16]) + 1) % (1 << 16)
    with pytest.raises((VerificationError, AssertionError)):
        p = prove(air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64), CFG)
        verify(air, p, CFG)
