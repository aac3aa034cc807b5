"""Pipelined proving: overlap host witness generation with device proving.

The e2e throughput of a proof *service* is bounded by
max(tracegen, prove), not their sum: witness generation runs on host CPU
(numpy + the native C++ chains, which release the GIL inside ctypes calls)
while the prove is device work the host mostly waits on. The reference has
no equivalent — its witness generation runs inline inside each plonky2
generator (/root/reference/src/fields/fq/circuit.rs:188-227) and its only
parallelism is rayon inside one prove.

`prove_pipelined` keeps ONE tracegen in flight ahead of the prove loop
(double buffering). Deeper prefetch buys nothing: the device is the
bottleneck once tracegen < prove, and each prefetched trace holds
~200 MB of host memory at the num_io=128 G1 shape.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp

from .air import Air
from .config import StarkConfig
from .proof import StarkProof
from .prover import prove


def prove_pipelined(
    air: Air,
    input_batches: list,
    cfg: StarkConfig,
    mesh=None,
) -> list[StarkProof]:
    """Proves one statement per input batch, overlapping batch i+1's
    trace generation with batch i's prove. Each element of `input_batches`
    is the `inputs` list `air.generate_trace_and_pi` expects (length
    air.num_io). Returns proofs in order; byte-identical to sequential
    prove() calls (tests/test_stark_e2e.py pins this)."""
    if not input_batches:
        return []
    proofs: list[StarkProof] = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(air.generate_trace_and_pi, input_batches[0])
        for i in range(len(input_batches)):
            trace, pi = pending.result()
            if i + 1 < len(input_batches):
                pending = pool.submit(
                    air.generate_trace_and_pi, input_batches[i + 1]
                )
            proofs.append(prove(air, jnp.asarray(trace), pi, cfg, mesh=mesh))
    return proofs
