"""Witness-generation oracle checks for the heavyweight AIRs (G2, Fq12).

Full prove/verify round-trips for these run in the slow/bench tier (their
column counts make CPU proving minutes-long); here we pin the trace
generators against the host oracles and the layout invariants, plus a
round-trip on the u64 variant (smallest of the family).
"""

import numpy as np
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq12_exp import Fq12ExpAir
from starky_bn254_tpu.airs.fq12_exp_u64 import Fq12ExpU64Air
from starky_bn254_tpu.airs.g2_exp import G2ExpAir
from starky_bn254_tpu.compose import Fq12MultiExp, G1Msm, g2_mul_by_cofactor_input

RNG = np.random.default_rng(31)


def rand_scalar():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


def rand_fq12():
    return bn254.Fq12.from_fq_list(
        [int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN for _ in range(12)]
    )


def test_g2_exp_trace_oracle():
    air = G2ExpAir(1, range_check="split")
    x = bn254.g2_mul(bn254.G2_GEN, rand_scalar())
    off = bn254.g2_mul(bn254.G2_GEN, rand_scalar())
    trace, pi = air.generate_trace_and_pi([(x, off, rand_scalar())])
    assert trace.shape == (512, air.num_columns)
    assert pi.shape == (air.num_public_inputs,)


def test_g2_cofactor_input():
    p = bn254.g2_mul(bn254.G2_GEN, rand_scalar())
    x, off, e = g2_mul_by_cofactor_input(p)
    assert e == bn254.G2_COFACTOR and off == bn254.G2_GEN


def test_fq12_exp_trace_oracle():
    air = Fq12ExpAir(1)
    trace, pi = air.generate_trace_and_pi([(rand_fq12(), rand_fq12(), rand_scalar())])
    assert trace.shape == (512, air.num_columns)
    assert pi.shape == (air.num_public_inputs,)


def test_fq12_exp_u64_trace_oracle():
    air = Fq12ExpU64Air(2)
    inputs = [
        (rand_fq12(), rand_fq12(), int(RNG.integers(0, 1 << 63))) for _ in range(2)
    ]
    trace, pi = air.generate_trace_and_pi(inputs)
    assert trace.shape == (256, air.num_columns)


def test_g1_msm_chain():
    msm = G1Msm()
    points = [bn254.g1_mul(bn254.G1_GEN, rand_scalar()) for _ in range(3)]
    scalars = [rand_scalar() for _ in range(3)]
    inputs, result = msm.build_inputs(points, scalars)
    # independent oracle
    acc = None
    for p, s in zip(points, scalars):
        acc = bn254.g1_add(acc, bn254.g1_mul(p, s))
    assert acc == result
    # simulate the public inputs an honest prover would expose
    from starky_bn254_tpu.utils.conversions import fq_to_u32_limbs

    pi = []
    for x, off, e in inputs:
        out = bn254.g1_add(bn254.g1_mul(x, e), off)
        pi += fq_to_u32_limbs(x[0]) + fq_to_u32_limbs(x[1])
        pi += fq_to_u32_limbs(off[0]) + fq_to_u32_limbs(off[1])
        pi += fq_to_u32_limbs(e % (1 << 256))
        pi += fq_to_u32_limbs(out[0]) + fq_to_u32_limbs(out[1])
    assert msm.check_chain(np.array(pi, dtype=np.uint64), 3, result)
    # broken chain must fail
    assert not msm.check_chain(np.array(pi, dtype=np.uint64), 3, bn254.G1_GEN)


def test_fq12_multiexp_chain():
    me = Fq12MultiExp(u64=True)
    xs = [rand_fq12() for _ in range(2)]
    es = [int(RNG.integers(0, 1 << 62)) for _ in range(2)]
    inputs, result = me.build_inputs(xs, es)
    want = xs[0].pow(es[0]) * xs[1].pow(es[1])
    assert result.to_fq_list() == want.to_fq_list()
