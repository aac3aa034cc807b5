"""Proof containers (+ serialization), host-side numpy arrays.

The reference keeps proofs only as in-memory Rust structs and leaves circuit
serialization `todo!()` (reference src/fields/fq/circuit.rs:155-160). Here
proofs are plain dataclasses of numpy arrays with an npz round-trip, so they
can be checked in as fixtures and verified across machines.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class FriQueryRound:
    initial_leaves: list[np.ndarray]  # per oracle: committed row [width]
    initial_paths: list[np.ndarray]  # per oracle: [depth, 4]
    layer_leaves: list[np.ndarray]  # per fold layer: [8] = 4 ext values (arity 4)
    layer_paths: list[np.ndarray]  # per fold layer: [depth_k, 4]


@dataclass
class FriProof:
    layer_caps: list[np.ndarray]  # per fold layer: [2^cap, 4]
    final_coeffs: np.ndarray  # [final_len, 2] extension coefficients
    pow_nonce: int
    query_rounds: list[FriQueryRound] = field(default_factory=list)


@dataclass
class StarkOpenings:
    trace_zeta: np.ndarray  # [C, 2]
    trace_gzeta: np.ndarray  # [C, 2]
    z_zeta: np.ndarray | None  # [nZ, 2]
    z_gzeta: np.ndarray | None
    quotient_zeta: np.ndarray  # [num_challenges * chunks, 2]

    def flat_elements(self) -> np.ndarray:
        parts = [self.trace_zeta, self.trace_gzeta]
        if self.z_zeta is not None:
            parts += [self.z_zeta, self.z_gzeta]
        parts.append(self.quotient_zeta)
        return np.concatenate([p.reshape(-1) for p in parts])


@dataclass
class StarkProof:
    degree_bits: int
    trace_cap: np.ndarray  # [2^cap, 4]
    z_cap: np.ndarray | None
    quotient_cap: np.ndarray
    openings: StarkOpenings
    fri: FriProof
    public_inputs: np.ndarray  # [P] u64


def save_proof(path: str, proof: StarkProof) -> None:
    flat: dict[str, np.ndarray] = {
        "degree_bits": np.array(proof.degree_bits),
        "trace_cap": proof.trace_cap,
        "quotient_cap": proof.quotient_cap,
        "openings/trace_zeta": proof.openings.trace_zeta,
        "openings/trace_gzeta": proof.openings.trace_gzeta,
        "openings/quotient_zeta": proof.openings.quotient_zeta,
        "fri/final_coeffs": proof.fri.final_coeffs,
        "fri/pow_nonce": np.array(proof.fri.pow_nonce, dtype=np.uint64),
        "public_inputs": proof.public_inputs,
        "fri/num_layers": np.array(len(proof.fri.layer_caps)),
        "fri/num_queries": np.array(len(proof.fri.query_rounds)),
    }
    if proof.z_cap is not None:
        flat["z_cap"] = proof.z_cap
        flat["openings/z_zeta"] = proof.openings.z_zeta
        flat["openings/z_gzeta"] = proof.openings.z_gzeta
    for k, cap in enumerate(proof.fri.layer_caps):
        flat[f"fri/layer_cap/{k}"] = cap
    for q, qr in enumerate(proof.fri.query_rounds):
        for o, (leaf, p) in enumerate(zip(qr.initial_leaves, qr.initial_paths)):
            flat[f"fri/q{q}/init_leaf/{o}"] = leaf
            flat[f"fri/q{q}/init_path/{o}"] = p
        for k, (leaf, p) in enumerate(zip(qr.layer_leaves, qr.layer_paths)):
            flat[f"fri/q{q}/layer_leaf/{k}"] = leaf
            flat[f"fri/q{q}/layer_path/{k}"] = p
    np.savez_compressed(path, **flat)


def load_proof(path: str) -> StarkProof:
    z = np.load(path)
    n_layers = int(z["fri/num_layers"])
    n_queries = int(z["fri/num_queries"])
    has_z = "z_cap" in z
    queries = []
    for q in range(n_queries):
        init_leaves, init_paths, layer_leaves, layer_paths = [], [], [], []
        o = 0
        while f"fri/q{q}/init_leaf/{o}" in z:
            init_leaves.append(z[f"fri/q{q}/init_leaf/{o}"])
            init_paths.append(z[f"fri/q{q}/init_path/{o}"])
            o += 1
        for k in range(n_layers):
            layer_leaves.append(z[f"fri/q{q}/layer_leaf/{k}"])
            layer_paths.append(z[f"fri/q{q}/layer_path/{k}"])
        queries.append(FriQueryRound(init_leaves, init_paths, layer_leaves, layer_paths))
    openings = StarkOpenings(
        trace_zeta=z["openings/trace_zeta"],
        trace_gzeta=z["openings/trace_gzeta"],
        z_zeta=z["openings/z_zeta"] if has_z else None,
        z_gzeta=z["openings/z_gzeta"] if has_z else None,
        quotient_zeta=z["openings/quotient_zeta"],
    )
    return StarkProof(
        degree_bits=int(z["degree_bits"]),
        trace_cap=z["trace_cap"],
        z_cap=z["z_cap"] if has_z else None,
        quotient_cap=z["quotient_cap"],
        openings=openings,
        fri=FriProof(
            layer_caps=[z[f"fri/layer_cap/{k}"] for k in range(n_layers)],
            final_coeffs=z["fri/final_coeffs"],
            pow_nonce=int(z["fri/pow_nonce"]),
            query_rounds=queries,
        ),
        public_inputs=z["public_inputs"],
    )
