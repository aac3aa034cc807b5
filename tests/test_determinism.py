"""Golden-value transcript determinism (SURVEY.md §5 "determinism").

The Fiat–Shamir transcript must be identical on every platform and every
run: any drift (numpy version, jax backend, dtype promotion, constant
generation) silently forks prover and verifier. These tests pin GOLDEN
values computed once from the specification:

* the first Poseidon round constant and MDS row (nothing-up-my-sleeve
  derivation from the SHA-256 counter stream must never drift),
* the challenger's output on a fixed observation sequence (covers the
  host permutation, overwrite-mode duplexing, and the vector-digest path),
* the full proof digest of a tiny fixed FqMul statement (covers every
  stage: NTT, commit, aux, composition, openings, FRI, PoW).

If an intentional change breaks these (e.g. swapping Poseidon constants for
plonky2 parity via poseidon.set_params), regenerate the golden values in the
same commit and say so: that change invalidates all previously issued proofs.
"""

import hashlib

import numpy as np

from starky_bn254_tpu import poseidon
from starky_bn254_tpu.challenger import Challenger

# -- constant-generation pins -------------------------------------------------

GOLDEN_MDS_ROW = (1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024)


def test_mds_row_pinned():
    assert tuple(int(v) for v in poseidon.FAST_MDS_ROW) == GOLDEN_MDS_ROW


def _digest_u64(arr) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr, dtype=np.uint64).tobytes()).hexdigest()[:16]


def test_round_constants_pinned():
    rc, _ = poseidon._constants()
    assert _digest_u64(rc) == "b670a8af60a7c56b"


def test_challenger_transcript_pinned():
    c = Challenger()
    c.observe_elements(list(range(7)))
    c.observe_elements(np.arange(1000, dtype=np.uint64))  # vector-digest path
    got = c.get_n_challenges(4)
    assert _digest_u64(np.array(got, dtype=np.uint64)) == "66748d59e7863dfb"


def proof_digest(proof) -> str:
    """Canonical digest over every field of a StarkProof (order-stable)."""
    h = hashlib.sha256()
    h.update(int(proof.degree_bits).to_bytes(8, "little"))
    h.update(int(proof.fri.pow_nonce).to_bytes(8, "little"))

    def upd(arr):
        if arr is not None:
            h.update(np.ascontiguousarray(arr, dtype=np.uint64).tobytes())

    for a in (proof.trace_cap, proof.z_cap, proof.quotient_cap,
              proof.openings.trace_zeta, proof.openings.trace_gzeta,
              proof.openings.z_zeta, proof.openings.z_gzeta,
              proof.openings.quotient_zeta, proof.fri.final_coeffs,
              proof.public_inputs):
        upd(a)
    for cap in proof.fri.layer_caps:
        upd(cap)
    for q in proof.fri.query_rounds:
        for group in (q.initial_leaves, q.initial_paths,
                      q.layer_leaves, q.layer_paths):
            for a in group:
                upd(a)
    return h.hexdigest()[:16]


def test_tiny_proof_digest_pinned():
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.fq_mul import FqMulAir
    from starky_bn254_tpu.stark import StarkConfig, prove

    rng = np.random.default_rng(7)
    fq = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.P_BN
    air = FqMulAir(256)
    trace = air.generate_trace([(fq(), fq()) for _ in range(64)])
    cfg = StarkConfig.test_config()
    proof = prove(air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64), cfg)
    assert proof_digest(proof) == "10cb158ab61caf68"
