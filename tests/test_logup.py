"""logUp lookup argument: round-trip + soundness probes on FqExpAir."""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import bn254
from starky_bn254_tpu.airs.fq_exp import FqExpAir
from starky_bn254_tpu.stark import StarkConfig, VerificationError, prove, verify

RNG = np.random.default_rng(55)
CFG = StarkConfig.test_config()


def rand_fq():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN


def rand_fr():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


@pytest.fixture(scope="module")
def air_proof():
    air = FqExpAir(2, range_check="logup")
    inputs = [(rand_fq(), rand_fq(), rand_fr()) for _ in range(2)]
    trace, pi = air.generate_trace_and_pi(inputs)
    proof = prove(air, jnp.asarray(trace), pi, CFG)
    return air, proof, trace, pi


def test_roundtrip(air_proof):
    air, proof, _, _ = air_proof
    assert len(air.permutation_pairs()) == 0  # no grand products in this mode
    assert len(air.lookup_tables()) == 1
    assert verify(air, proof, CFG)


def test_tampered_multiplicity_rejected(air_proof):
    air, _, trace, pi = air_proof
    bad = trace.copy()
    mcol = air.lookup_tables()[0][1]
    bad[0, mcol] = int(bad[0, mcol]) + 1
    with pytest.raises((VerificationError, AssertionError)):
        p = prove(air, jnp.asarray(bad), pi, CFG)
        verify(air, p, CFG)


def test_out_of_range_cell_rejected(air_proof):
    """Force an out-of-range aux value with a consistent byte split forged
    ABOVE 255 — the table lookup must catch it."""
    air, _, trace, pi = air_proof
    bad = trace.copy()
    # aux_lo limb cell (range-checked target 2*16): set to 256+3, and forge
    # its lo/hi byte-split columns consistently so only the lookup can object
    target_idx = 2 * 16  # an output-limb column, range target index 2*16
    col = air.rc_spec.targets[target_idx]
    lo_col = air.rc_spec.start_col + 2 + 2 * target_idx
    hi_col = lo_col + 1
    bad[5, col] = 0x1FF00
    bad[5, lo_col] = 0x00
    bad[5, hi_col] = 0x1FF  # > 255: not in the table
    with pytest.raises((VerificationError, AssertionError, ValueError)):
        p = prove(air, jnp.asarray(bad), pi, CFG)
        verify(air, p, CFG)


def test_gather_path_matches_fermat_path():
    """The u16 inverse-table gather (one [2^16] Fermat program + gathers)
    must produce byte-identical aux columns to the per-cell Fermat path."""
    import os

    import numpy as np

    from starky_bn254_tpu.stark import logup

    tr = np.random.default_rng(7).integers(0, 1 << 16, size=(65536, 8),
                                           dtype=np.uint64)
    tr[:, 0] = np.arange(65536)
    tables = [(0, 1, tuple(range(2, 8)))]
    gathered = logup.compute_logup_columns(tr, tables, [999, 424242])
    os.environ["STARKY_NO_LOGUP_GATHER"] = "1"
    try:
        fermat = logup.compute_logup_columns(tr, tables, [999, 424242])
    finally:
        del os.environ["STARKY_NO_LOGUP_GATHER"]
    assert np.array_equal(np.asarray(gathered), np.asarray(fermat))


def test_streamed_columns_match_device_path():
    """compute_logup_columns_streamed (host-assembled row blocks, the
    north-star memory path) is byte-identical to the all-device build."""
    import numpy as np

    from starky_bn254_tpu.stark import logup

    tr = np.random.default_rng(9).integers(0, 1 << 16, size=(65536, 10),
                                           dtype=np.uint64)
    tr[:, 0] = np.arange(65536)
    tables = [(0, 1, tuple(range(2, 10)))]
    gammas = [31337, 271828]
    device = np.asarray(logup.compute_logup_columns(tr, tables, gammas))
    streamed = logup.compute_logup_columns_streamed(
        tr, tables, gammas, block=1 << 14
    )
    assert np.array_equal(streamed, device)
