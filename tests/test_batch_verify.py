"""Multi-proof batch verification (stark/batch_verify.py): mixed families,
serialized proofs, chain checks, and per-item failure isolation.

This is the sanctioned substitute for the reference's recursive aggregation
(SURVEY.md §7.8): the reference composes proofs by in-circuit verification
(src/fields/fq/circuit.rs:106-108); here N serialized proofs verify in one
call with shared compiled graphs + the MSM chain relations checked against
each proof's public inputs.
"""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq_exp import FqExpAir
from starky_bn254_tpu.airs.fq_mul import FqMulAir
from starky_bn254_tpu.airs.g1_exp import G1ExpAir
from starky_bn254_tpu.compose import G1Msm
from starky_bn254_tpu.stark import StarkConfig, prove, save_proof
from starky_bn254_tpu.stark.batch_verify import BatchItem, verify_batch

RNG = np.random.default_rng(17)
CFG = StarkConfig.test_config()


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


def rand_scalar():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


@pytest.fixture(scope="module")
def proofs(tmp_path_factory):
    items = []
    # two layout-equal FqExp proofs (shared compiled graphs) ...
    fq_air = FqExpAir(2, range_check="split")
    for _ in range(2):
        trace, pi = fq_air.generate_trace_and_pi(
            [(rand_fq(), rand_fq(), rand_scalar()) for _ in range(2)]
        )
        items.append((fq_air, prove(fq_air, jnp.asarray(trace), pi, CFG)))
    # ... a FqMul proof (different family) ...
    mul_air = FqMulAir(256)
    trace = mul_air.generate_trace([(rand_fq(), rand_fq()) for _ in range(200)])
    items.append(
        (mul_air, prove(mul_air, jnp.asarray(trace), np.zeros(0, np.uint64), CFG))
    )
    # ... and a 2-point G1 MSM with its chain relation
    msm = G1Msm()
    points = [bn254.g1_mul(bn254.G1_GEN, rand_scalar()) for _ in range(2)]
    scalars = [rand_scalar() for _ in range(2)]
    inputs, result = msm.build_inputs(points, scalars)
    g1_air = G1ExpAir(2, range_check="split")
    trace, pi = g1_air.generate_trace_and_pi(inputs)
    g1_proof = prove(g1_air, jnp.asarray(trace), pi, CFG)
    items.append((g1_air, g1_proof))
    return items, msm, result


def test_mixed_family_batch(proofs):
    items, msm, result = proofs
    batch = [BatchItem(air=a, proof=p, label=f"p{i}") for i, (a, p) in enumerate(items)]
    batch[-1].chain_check = lambda pi: msm.check_chain(pi, 2, result)
    res = verify_batch(batch, CFG)
    assert res.ok and res.results == [True] * 4
    assert res.groups == 3  # two FqExp proofs share one layout group
    assert all(t > 0 for t in res.per_proof_s)


def test_batch_isolates_failures(proofs):
    items, msm, result = proofs
    bad = copy.deepcopy(items[0][1])
    bad.public_inputs = bad.public_inputs.copy()
    bad.public_inputs[0] = (int(bad.public_inputs[0]) + 1) % (1 << 16)
    batch = [
        BatchItem(air=items[0][0], proof=items[0][1]),
        BatchItem(air=items[0][0], proof=bad),
        BatchItem(air=items[2][0], proof=items[2][1]),
    ]
    res = verify_batch(batch, CFG)
    assert not res.ok
    assert res.results == [True, False, True]
    assert res.errors[1] is not None


def test_batch_serialized_and_chain_failure(proofs, tmp_path):
    items, msm, result = proofs
    path = str(tmp_path / "g1.npz")
    save_proof(path, items[3][1])
    # valid proof, wrong claimed MSM result -> chain check must fail the item
    batch = [
        BatchItem(
            air=items[3][0],
            proof=path,
            chain_check=lambda pi: msm.check_chain(pi, 2, bn254.G1_GEN),
        )
    ]
    res = verify_batch(batch, CFG)
    assert not res.ok and res.errors[0] == "chain check failed"
