"""Multi-proof batch verification.

The sanctioned recursion substitute (SURVEY.md §7.8): where the reference
wraps every STARK in a plonky2 recursive-verifier circuit so proofs compose
into one SNARK (reference src/fields/fq/circuit.rs:106-108 and twins), this
framework ships serialized proofs (stark/proof.py npz) plus a batch verifier
that checks N proofs of mixed families in one call with shared compiled
graphs:

* items are grouped by `Air.layout_key()` so every jitted verifier graph
  (the segmented composition replay at zeta, the batched Merkle/fold query
  checks, the vector-observe tree hashes) compiles once per layout and is
  reused across that group — the dominant per-proof cost after the first
  verify is a few dozen small executable launches;
* optional per-item chain checks (the MSM offset-chaining relations of
  compose/msm.py) run against each proof's public inputs, so a chained
  multi-proof statement (e.g. an MSM split across proofs, or mixed
  G1/G2/Fq12 statements of one protocol) is validated end-to-end.

Everything runs pinned to the host CPU backend via `verify()` (tiny-op
workload; see stark/verifier.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from .air import Air
from .config import StarkConfig
from .proof import StarkProof, load_proof
from .verifier import VerificationError, verify


@dataclass
class BatchItem:
    air: Air
    proof: StarkProof | str  # in-memory proof or path to an npz
    cfg: StarkConfig | None = None
    # optional semantic check on the (verified) public inputs, e.g.
    # lambda pi: G1Msm().check_chain(pi, n_real, result)
    chain_check: Callable[[Any], bool] | None = None
    label: str = ""


@dataclass
class BatchResult:
    ok: bool
    results: list[bool]  # per original item order
    errors: list[str | None]
    per_proof_s: list[float]  # wall-clock per proof, original order
    total_s: float = 0.0
    groups: int = 0  # distinct layouts (== compile groups)


def verify_batch(
    items: list[BatchItem], cfg: StarkConfig | None = None
) -> BatchResult:
    """Verify a batch of proofs (mixed families allowed).

    Returns per-item results instead of raising: a production aggregator
    needs to know WHICH proof failed. `ok` is the conjunction.
    """
    default_cfg = cfg or StarkConfig.standard_fast_config()
    t_start = time.perf_counter()

    # group indices by layout so compiled graphs are shared within a group
    groups: dict[tuple, list[int]] = {}
    for i, it in enumerate(items):
        key = (it.air.layout_key(), it.cfg or default_cfg)
        groups.setdefault(key, []).append(i)

    results = [False] * len(items)
    errors: list[str | None] = [None] * len(items)
    times = [0.0] * len(items)
    for idx_list in groups.values():
        for i in idx_list:
            it = items[i]
            t0 = time.perf_counter()
            try:
                proof = it.proof
                if isinstance(proof, str):
                    proof = load_proof(proof)
                ok = verify(it.air, proof, it.cfg or default_cfg)
                if ok and it.chain_check is not None:
                    ok = bool(it.chain_check(proof.public_inputs))
                    if not ok:
                        errors[i] = "chain check failed"
                results[i] = ok
            except VerificationError as e:
                errors[i] = str(e)
            except FileNotFoundError as e:
                errors[i] = f"proof file missing: {e}"
            times[i] = time.perf_counter() - t0

    return BatchResult(
        ok=all(results),
        results=results,
        errors=errors,
        per_proof_s=times,
        total_s=time.perf_counter() - t_start,
        groups=len(groups),
    )
