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
the prove's dispatch loop. The TRACEGEN forks always happen from the
main thread while no prefetch thread is alive (get() joins before the
next spawn). That guarantee is scoped to tracegen forks only: the
package's fork-isolated compile-cache writes (__init__._forked_put) can
still fire inside prove() while the prefetch thread is mid-device_put;
those children rely on their pre-fork alarm to escape any inherited
lock, at worst skipping a cache entry on a cold run.

Device-memory note: steady state keeps TWO full traces resident on the
device (the current prove's + the prefetched next one — 2 x ~212 MB at
the num_io=128 G1 shape). If the prefetch device_put fails (OOM), the
prefetch falls back to handing back the HOST trace and the prove's own
transfer runs inline — correctness unchanged, overlap lost for that
batch.
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


def _dbg(msg: str) -> None:
    """Timeline marks for the pipelined path (STARKY_PIPE_DEBUG=1)."""
    if os.environ.get("STARKY_PIPE_DEBUG"):
        import sys

        sys.stderr.write(f"[pipe {time.time() % 1000:7.2f}] {msg}\n")
        sys.stderr.flush()


def _pack_trace(trace: np.ndarray):
    """Split a [n, C] u64 trace into u32-safe and full-width column groups.

    The tunneled-TPU H2D path is CPU-compression-bound (~62 MB/s on the
    u16-heavy G1 trace as u64, ~49 MB/s for the same data as u32 with half
    the bytes — measured round 5); ~97% of the G1 columns hold values
    < 2^32 (u16 range-check limbs, 0/1 flags, small multiplicities), so
    shipping them as u32 nearly halves the per-batch upload. uint16 is NOT
    used: the plugin's u16 transfer path measured SLOWER per byte than u32.
    The device widens and re-orders with one jitted concat+static-gather;
    tests pin prove_pipelined byte-identity against sequential proves."""
    mx = trace.max(axis=0)
    idx32 = np.where(mx < (1 << 32))[0].astype(np.int32)
    idx64 = np.where(mx >= (1 << 32))[0].astype(np.int32)
    inv = np.argsort(np.concatenate([idx32, idx64])).astype(np.int32)
    return (
        np.ascontiguousarray(trace[:, idx32]).astype(np.uint32),
        np.ascontiguousarray(trace[:, idx64]),
        inv,
    )


@jax.jit
def _unpack_trace(c32, c64, inv):
    import jax.numpy as jnp

    full = jnp.concatenate([c32.astype(jnp.uint64), c64], axis=1)
    return jnp.take(full, inv, axis=1)


class _PackedTrace(tuple):
    """(c32, c64, inv) still on host — staged to device by _stage()."""


def _stage_on_device() -> bool:
    """Whether the prefetch thread should device_put the next trace.

    Over the tunneled TPU the answer is NO, measured: a concurrent 106 MB
    upload and the prove's dispatch stream mutually serialize on the
    single-stream transport (prove 2.5 s -> 19-21 s, upload 3 s -> 15 s —
    /tmp/pipe_debug round 5). There, the upload runs serially in the main
    loop between proves (only tracegen overlaps). On locally-attached
    devices DMA and dispatch are independent, so staging from the thread
    overlaps cleanly. STARKY_PIPE_DEVICE_PREFETCH=1/0 overrides."""
    v = os.environ.get("STARKY_PIPE_DEVICE_PREFETCH")
    if v is not None:
        return v == "1"
    try:
        # cpu/gpu backends are in-process (DMA overlaps dispatch); a tpu
        # platform may be the tunneled remote — default to the serial
        # upload there (a local TPU host sets the env override to 1)
        return jax.devices()[0].platform in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return True


def _stage(trace_like):
    """Materialize a prefetch result as a device trace (no-op if staged)."""
    if isinstance(trace_like, _PackedTrace):
        c32, c64, inv = trace_like
        t0 = time.time()
        out = _unpack_trace(
            jax.device_put(c32), jax.device_put(c64), jax.device_put(inv)
        )
        out.block_until_ready()
        _dbg(f"serial upload+unpack {time.time() - t0:.2f}s")
        return out
    return trace_like


def _spawn_tracegen(air: Air, inputs):
    """Forks a worker that runs air.generate_trace_and_pi(inputs) and
    streams (trace, pi) back over a pipe. Returns (join, cancel):
    join() blocks for the result; cancel() kills the child and reaps it
    (used when the pipeline aborts mid-loop so a doomed tracegen doesn't
    run to completion unsupervised)."""
    import signal

    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child
        code = 1
        try:
            os.close(r)
            try:
                # leave the parent's device-dispatch loop and the tunnel
                # client's compression threads a responsive share of the
                # cores: an uncapped 4-thread native tracegen measured a
                # ~6x inflation of the concurrent prove's wall clock
                try:
                    os.nice(10)
                except OSError:  # pragma: no cover
                    pass
                os.environ.setdefault("STARKY_NATIVE_THREADS", "2")
                trace, pi = air.generate_trace_and_pi(inputs)
                payload = pickle.dumps(
                    _pack_trace(np.asarray(trace)) + (np.asarray(pi),),
                    protocol=5,
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

    def cancel():
        try:
            os.kill(pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        try:
            os.waitpid(pid, 0)
        except ChildProcessError:
            pass

    return join, cancel


class _DevicePrefetch:
    """Joins a tracegen worker and stages its trace onto the device from a
    daemon thread, so the H2D transfer of batch i+1 overlaps the device
    prove of batch i instead of serializing after it."""

    def __init__(self, spawned):
        join, self._cancel = spawned
        self._result = None
        self._exc = None
        self._thread = threading.Thread(
            target=self._run, args=(join,), daemon=True
        )
        self._thread.start()

    def _run(self, join):
        try:
            t0 = time.time()
            c32, c64, inv, pi = join()
            _dbg(f"prefetch: tracegen+pipe {time.time() - t0:.2f}s")
            trace_like = _PackedTrace((c32, c64, inv))
            if _stage_on_device():
                try:
                    t0 = time.time()
                    d32 = jax.device_put(c32)
                    d64 = jax.device_put(c64)
                    staged = _unpack_trace(d32, d64, jax.device_put(inv))
                    # force the enqueue NOW (device_put is lazy-ish under
                    # some backends); completion awaited by the consumer
                    staged.block_until_ready()
                    trace_like = staged
                    _dbg(f"prefetch: upload+unpack {time.time() - t0:.2f}s")
                except Exception:
                    # device staging failed (e.g. HBM exhausted holding two
                    # traces): keep the packed host arrays — the main
                    # loop's _stage() uploads inline, losing overlap only
                    pass
            self._result = (trace_like, pi)
        except BaseException as e:  # surfaced in get()
            self._exc = e

    def get(self):
        self._thread.join()
        if self._exc is not None:
            raise self._exc
        return self._result

    def abort(self):
        """Kill the underlying tracegen child and reap the thread: closing
        the child unblocks the pipe read, so the thread exits promptly."""
        self._cancel()
        self._thread.join(timeout=30)


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
    try:
        for i in range(len(input_batches)):
            t0 = time.time()
            trace_like, pi = prefetch.get()
            _dbg(f"batch {i}: get() waited {time.time() - t0:.2f}s")
            trace_dev = _stage(trace_like)
            prefetch = None
            if i + 1 < len(input_batches):
                # fork first (no prefetch thread is alive here), then hand
                # the pipe to the next prefetch thread
                prefetch = _DevicePrefetch(
                    _spawn_tracegen(air, input_batches[i + 1])
                )
            t0 = time.time()
            proofs.append(prove(air, trace_dev, pi, cfg, mesh=mesh))
            _dbg(f"batch {i}: prove {time.time() - t0:.2f}s")
            if on_proof is not None:
                on_proof(i, time.time())
    except BaseException:
        # a failed prove/get must not leave the in-flight tracegen child
        # (a full witness build + ~212 MB upload) running unsupervised
        if prefetch is not None:
            prefetch.abort()
        raise
    return proofs
