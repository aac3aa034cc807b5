"""Native witness kernels must be bit-identical to the exact-int Python path."""

import numpy as np
import pytest

from starky_bn254_tpu import bn254, native
from starky_bn254_tpu.gadgets import modular as mod
from starky_bn254_tpu.utils.conversions import int_to_limbs, int_to_signed_limbs

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

RNG = np.random.default_rng(41)


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


def test_modular_witness_matches_python():
    pols = []
    for _ in range(64):
        x, y, z = rand_fq(), rand_fq(), rand_fq()
        xl, yl, zl = int_to_limbs(x), int_to_limbs(y), int_to_limbs(z)
        pi = [0] * 31
        for i in range(16):
            for j in range(16):
                pi[i + j] += xl[i] * yl[j]
        for i in range(16):
            pi[i] -= 5 * zl[i]  # exercise signed inputs
        pols.append(pi)
    res = native.batch_modular_witness(np.array(pols, dtype=np.int64), zero_op=False)
    for k in range(64):
        w = mod.generate_modular_op(bn254.P_BN, pols[k])
        assert list(res["outputs"][k]) == w["output"]
        assert list(res["out_aux_red"][k]) == w["out_aux_red"]
        assert list(res["quot_abs"][k]) == w["quot_abs"]
        assert list(res["aux_lo"][k]) == w["aux_lo"]
        assert list(res["aux_hi"][k]) == w["aux_hi"]
        assert int(res["signs"][k]) == w["quot_sign"]


def test_modular_zero_matches_python():
    pols = []
    for _ in range(32):
        q = int.from_bytes(RNG.bytes(30), "little") - (1 << 230)
        pols.append(int_to_signed_limbs(q * bn254.P_BN, 31))
    res = native.batch_modular_witness(np.array(pols, dtype=np.int64), zero_op=True)
    for k in range(32):
        w = mod.generate_modular_zero(bn254.P_BN, pols[k])
        assert list(res["quot_abs"][k]) == w["quot_abs"]
        assert list(res["aux_lo"][k]) == w["aux_lo"]
        assert list(res["aux_hi"][k]) == w["aux_hi"]
        assert int(res["signs"][k]) == w["quot_sign"]


def test_fq_inv():
    vals = [rand_fq() or 1 for _ in range(64)]
    limbs = np.array([int_to_limbs(v) for v in vals], dtype=np.uint16)
    inv = native.batch_fq_inv(limbs)
    for k in range(64):
        got = sum(int(v) << (16 * i) for i, v in enumerate(inv[k]))
        assert got * vals[k] % bn254.P_BN == 1


def test_g1_batch_trace_matches_scalar():
    """The vectorized G1 trace generator must equal the per-instance path."""
    from starky_bn254_tpu.airs.g1_exp import G1ExpAir

    def rs():
        return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN

    inputs = [
        (bn254.g1_mul(bn254.G1_GEN, rs()), bn254.g1_mul(bn254.G1_GEN, rs()), rs())
        for _ in range(2)
    ]
    air = G1ExpAir(2, range_check="split")
    t_fast, pi_fast = air.generate_trace_and_pi(inputs)

    # force the scalar path
    orig = native.available
    try:
        native.available = lambda: False
        t_slow, pi_slow = air.generate_trace_and_pi(inputs)
    finally:
        native.available = orig
    assert np.array_equal(pi_fast, pi_slow)
    assert np.array_equal(t_fast, t_slow)


def test_g2_batch_trace_matches_scalar():
    from starky_bn254_tpu.airs.g2_exp import G2ExpAir

    def rs():
        return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN

    inputs = [
        (bn254.g2_mul(bn254.G2_GEN, rs()), bn254.g2_mul(bn254.G2_GEN, rs()), rs())
    ]
    air = G2ExpAir(1, range_check="split")
    t_fast, pi_fast = air.generate_trace_and_pi(inputs)
    orig = native.available
    try:
        native.available = lambda: False
        t_slow, pi_slow = air.generate_trace_and_pi(inputs)
    finally:
        native.available = orig
    assert np.array_equal(pi_fast, pi_slow)
    assert np.array_equal(t_fast, t_slow)


def test_fq12_batch_trace_matches_scalar():
    from starky_bn254_tpu.airs.fq12_exp_u64 import Fq12ExpU64Air

    def rfq12():
        return bn254.Fq12.from_fq_list(
            [int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN for _ in range(12)]
        )

    inputs = [
        (rfq12(), rfq12(), int(RNG.integers(1, 1 << 62))) for _ in range(2)
    ]
    air = Fq12ExpU64Air(2)
    t_fast, pi_fast = air.generate_trace_and_pi(inputs)
    orig = native.available
    try:
        native.available = lambda: False
        t_slow, pi_slow = air.generate_trace_and_pi(inputs)
    finally:
        native.available = orig
    assert np.array_equal(pi_fast, pi_slow)
    assert np.array_equal(t_fast, t_slow)


def test_fq_exp_chain_trace_matches_batch():
    """Fused C++ fq_exp_chain writes the exact trace the row-loop batch
    path produces (which itself is pinned against the scalar path)."""
    from starky_bn254_tpu.airs.fq_exp import FqExpAir

    if not native.has_exp_chain("fq_exp_chain"):
        pytest.skip("native fq_exp_chain unavailable")

    def rfq():
        return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN

    inputs = [
        (rfq(), rfq(), int.from_bytes(RNG.bytes(32), "little")) for _ in range(2)
    ]
    air = FqExpAir(2, range_check="split")
    t_fast, pi_fast = air.generate_trace_and_pi(inputs)
    orig = native.has_exp_chain
    try:
        native.has_exp_chain = lambda name: False
        t_slow, pi_slow = air.generate_trace_and_pi(inputs)
    finally:
        native.has_exp_chain = orig
    assert np.array_equal(pi_fast, pi_slow)
    assert np.array_equal(t_fast, t_slow)


def test_fq12_exp_chain_trace_matches_batch():
    """Fused C++ fq12_exp_chain (144-conv schoolbook + xi-fold in C++)
    byte-matches the per-row fq12_mul_cells_batch path."""
    from starky_bn254_tpu.airs.fq12_exp import Fq12ExpAir

    if not native.has_exp_chain("fq12_exp_chain"):
        pytest.skip("native fq12_exp_chain unavailable")

    def rfq12():
        return bn254.Fq12.from_fq_list(
            [int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN for _ in range(12)]
        )

    inputs = [
        (rfq12(), rfq12(), int.from_bytes(RNG.bytes(32), "little"))
        for _ in range(2)
    ]
    air = Fq12ExpAir(2)
    t_fast, pi_fast = air.generate_trace_and_pi(inputs)
    orig = native.has_exp_chain
    try:
        native.has_exp_chain = lambda name: False
        t_slow, pi_slow = air.generate_trace_and_pi(inputs)
    finally:
        native.has_exp_chain = orig
    assert np.array_equal(pi_fast, pi_slow)
    assert np.array_equal(t_fast, t_slow)
