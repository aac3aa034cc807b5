"""Generic STARK engine: AIR interface, prover, verifier, FRI, config."""

from .air import Air
from .batch_prove import BatchStarkProof, prove_batch_fri, verify_batch_fri
from .batch_verify import BatchItem, BatchResult, verify_batch
from .config import FriConfig, StarkConfig
from .proof import StarkProof, load_proof, save_proof
from .pipeline import prove_pipelined
from .prover import prove
from .verifier import VerificationError, verify

__all__ = [
    "Air",
    "FriConfig",
    "StarkConfig",
    "StarkProof",
    "load_proof",
    "save_proof",
    "prove",
    "prove_pipelined",
    "verify",
    "VerificationError",
    "BatchStarkProof",
    "prove_batch_fri",
    "verify_batch_fri",
    "BatchItem",
    "BatchResult",
    "verify_batch",
]
