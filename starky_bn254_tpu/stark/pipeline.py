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

The host->device TRANSFER of the next trace is prefetched too, in a
small I/O thread (`_DevicePrefetch`): over the tunneled TPU the
[65536, 404] u64 trace is ~212 MB and a synchronous device_put between
proves re-serializes exactly the cost the pipeline exists to hide
(measured: ~16 s/batch pipelined vs ~4 s serial-with-resident-trace at
the num_io=128 G1 shape — the transfer, not the fork, was the gap).
Unlike the abandoned full-tracegen thread, this thread only reads a
pipe and calls device_put — both GIL-releasing — so it cannot starve
the prove's dispatch loop. The fork for batch i+1 always happens from
the main thread while no prefetch thread is alive (get() joins before
the next spawn), keeping the fork single-threaded-safe.
"""

from __future__ import annotations

import os
import pickle
import struct
import threading
import time

import jax
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
            try:
                trace, pi = air.generate_trace_and_pi(inputs)
                payload = pickle.dumps(
                    (np.asarray(trace), np.asarray(pi)), protocol=5
                )
                ok = b"\x01"
            except BaseException:
                import traceback

                payload = traceback.format_exc().encode()
                ok = b"\x00"
            with os.fdopen(w, "wb") as f:
                f.write(ok)
                f.write(struct.pack("<Q", len(payload)))
                f.write(payload)
            code = 0 if ok == b"\x01" else 1
        finally:
            os._exit(code)  # skip atexit/JAX teardown in the fork
    os.close(w)

    def join():
        with os.fdopen(r, "rb") as f:
            head = f.read(9)
            if len(head) < 9:
                os.waitpid(pid, 0)
                raise RuntimeError(
                    "tracegen worker died before writing its header "
                    "(likely killed by the OS, e.g. OOM)"
                )
            ok = head[0:1]
            (ln,) = struct.unpack("<Q", head[1:9])
            payload = f.read(ln)
        _, status = os.waitpid(pid, 0)
        if ok != b"\x01":
            raise RuntimeError(
                "tracegen worker raised:\n" + payload.decode(errors="replace")
            )
        if len(payload) != ln:
            raise RuntimeError(
                f"tracegen worker truncated (status={status}, "
                f"got {len(payload)}/{ln} bytes)"
            )
        return pickle.loads(payload)

    return join


class _DevicePrefetch:
    """Joins a tracegen worker and stages its trace onto the device from a
    daemon thread, so the H2D transfer of batch i+1 overlaps the device
    prove of batch i instead of serializing after it."""

    def __init__(self, join):
        self._result = None
        self._exc = None
        self._thread = threading.Thread(
            target=self._run, args=(join,), daemon=True
        )
        self._thread.start()

    def _run(self, join):
        try:
            trace, pi = join()
            trace_dev = jax.device_put(trace)
            # force the enqueue NOW (device_put is lazy-ish under some
            # backends); completion is awaited by the consumer's first use
            trace_dev.block_until_ready()
            self._result = (trace_dev, pi)
        except BaseException as e:  # surfaced in get()
            self._exc = e

    def get(self):
        self._thread.join()
        if self._exc is not None:
            raise self._exc
        return self._result


def prove_pipelined(
    air: Air,
    input_batches: list,
    cfg: StarkConfig,
    mesh=None,
    on_proof=None,
) -> list[StarkProof]:
    """Proves one statement per input batch, overlapping batch i+1's
    trace generation (forked worker) with batch i's prove. Each element of
    `input_batches` is the `inputs` list `air.generate_trace_and_pi`
    expects (length air.num_io). Returns proofs in order; byte-identical
    to sequential prove() calls (tests/test_stark_e2e.py pins this).

    `on_proof(i, wall_time)` fires as each proof materializes — callers
    measuring steady-state service throughput time from the FIRST
    completed proof, excluding the one-time pipeline fill (first batch's
    tracegen + device upload have nothing to overlap with)."""
    if not input_batches:
        return []
    proofs: list[StarkProof] = []
    prefetch = _DevicePrefetch(_spawn_tracegen(air, input_batches[0]))
    for i in range(len(input_batches)):
        trace_dev, pi = prefetch.get()
        if i + 1 < len(input_batches):
            # fork first (no prefetch thread is alive here), then hand the
            # pipe to the next prefetch thread
            prefetch = _DevicePrefetch(
                _spawn_tracegen(air, input_batches[i + 1])
            )
        proofs.append(prove(air, trace_dev, pi, cfg, mesh=mesh))
        if on_proof is not None:
            on_proof(i, time.time())
    return proofs
