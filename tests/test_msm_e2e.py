"""End-to-end G1 MSM: chained proof + verification + chain check.

The reference's equivalent is test_g1_msm (src/curves/g1/circuit.rs:458-509),
which wires instance IO inside a plonky2 circuit; here the chain is checked
against the verified proof's public inputs.
"""

import numpy as np
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.compose.msm import prove_g1_msm, verify_g1_msm
from starky_bn254_tpu.stark import StarkConfig

RNG = np.random.default_rng(91)
CFG = StarkConfig.test_config()


def rs():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


def test_g1_msm_end_to_end():
    points = [bn254.g1_mul(bn254.G1_GEN, rs()) for _ in range(3)]
    scalars = [rs() for _ in range(3)]
    proof, result, air, n_real = prove_g1_msm(
        points, scalars, CFG, range_check="logup", io_binding="rlc"
    )
    # independent oracle
    acc = None
    for p, s in zip(points, scalars):
        acc = bn254.g1_add(acc, bn254.g1_mul(p, s))
    assert acc == result
    assert verify_g1_msm(proof, result, air, n_real, CFG)
    # wrong claimed result fails the chain check
    assert not verify_g1_msm(proof, bn254.G1_GEN, air, n_real, CFG)
