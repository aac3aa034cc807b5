"""Generic STARK engine: AIR interface, prover, verifier, FRI, config."""

from .air import Air
from .config import FriConfig, StarkConfig
from .proof import StarkProof, load_proof, save_proof
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
    "verify",
    "VerificationError",
]
