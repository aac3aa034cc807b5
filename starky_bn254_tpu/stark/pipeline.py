"""Pipelined proving: overlap host witness generation with device proving.

The e2e throughput of a proof *service* is bounded by
max(tracegen, prove), not their sum: witness generation runs on host CPU
(numpy + the native C++ chains) while the prove is device work. The
reference has no equivalent — its witness generation runs inline inside
each plonky2 generator (/root/reference/src/fields/fq/circuit.rs:188-227)
and its only parallelism is rayon inside one prove.

Tracegen runs in a FORKED WORKER PROCESS, not a thread: a thread-based
prefetch measured 7.9 inst/s against 31.9 serial at the num_io=128 G1
shape (queue_bench.log round 4) — the tracegen thread's numpy sections
hold the GIL and starve the prove's dispatch loop, which must issue
hundreds of latency-sensitive enqueues. A fork sidesteps the GIL entirely
(same pattern as the package's fork-isolated cache writes); the trace
comes back through a pipe as raw bytes. Fork happens lazily per call and
the child never touches JAX.

`prove_pipelined` keeps ONE tracegen in flight ahead of the prove loop
(double buffering). Deeper prefetch buys nothing: the device is the
bottleneck once tracegen < prove, and each prefetched trace holds
~200 MB of host memory at the num_io=128 G1 shape.
"""

from __future__ import annotations

import os
import pickle
import struct

import jax.numpy as jnp
import numpy as np

from .air import Air
from .config import StarkConfig
from .proof import StarkProof
from .prover import prove


def _spawn_tracegen(air: Air, inputs):
    """Forks a worker that runs air.generate_trace_and_pi(inputs) and
    streams (trace, pi) back over a pipe. Returns a join() callable."""
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child
        code = 1
        try:
            os.close(r)
            trace, pi = air.generate_trace_and_pi(inputs)
            payload = pickle.dumps(
                (np.asarray(trace), np.asarray(pi)), protocol=5
            )
            with os.fdopen(w, "wb") as f:
                f.write(struct.pack("<Q", len(payload)))
                f.write(payload)
            code = 0
        finally:
            os._exit(code)  # skip atexit/JAX teardown in the fork
    os.close(w)

    def join():
        with os.fdopen(r, "rb") as f:
            (ln,) = struct.unpack("<Q", f.read(8))
            payload = f.read(ln)
        _, status = os.waitpid(pid, 0)
        if status != 0 or len(payload) != ln:
            raise RuntimeError(
                f"tracegen worker failed (status={status}, "
                f"got {len(payload)}/{ln} bytes)"
            )
        return pickle.loads(payload)

    return join


def prove_pipelined(
    air: Air,
    input_batches: list,
    cfg: StarkConfig,
    mesh=None,
) -> list[StarkProof]:
    """Proves one statement per input batch, overlapping batch i+1's
    trace generation (forked worker) with batch i's prove. Each element of
    `input_batches` is the `inputs` list `air.generate_trace_and_pi`
    expects (length air.num_io). Returns proofs in order; byte-identical
    to sequential prove() calls (tests/test_stark_e2e.py pins this)."""
    if not input_batches:
        return []
    proofs: list[StarkProof] = []
    pending = _spawn_tracegen(air, input_batches[0])
    for i in range(len(input_batches)):
        trace, pi = pending()
        if i + 1 < len(input_batches):
            pending = _spawn_tracegen(air, input_batches[i + 1])
        proofs.append(prove(air, jnp.asarray(trace), pi, cfg, mesh=mesh))
    return proofs
