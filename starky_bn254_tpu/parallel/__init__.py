"""Multi-chip sharding: mesh utilities and the distributed prover pipeline."""
