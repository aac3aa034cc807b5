"""Array-namespace dispatcher: one constraint-evaluation code path, two
execution engines.

The polymorphic eval layer (goldilocks ops, `field_expr.Val`, the gadget and
AIR `eval` functions) is imported by BOTH:

* the prover, which traces it under `jax.make_jaxpr` over LDE row blocks and
  compiles segments (stark/composition.py) — array inputs are jax Arrays or
  tracers; and
* the verifier, which replays the identical constraints on a handful of
  extension SCALARS at zeta. Running ~4·10^5 primitive ops through jax's
  eager dispatch costs ~100 µs each (measured: >70 s for one G2 verify, and
  tracing + segment-compiling the graph instead cost minutes of XLA work per
  layout); plain numpy does the same op in ~1 µs.

This module exposes the jnp functions that layer uses, dispatching per call:
if any array argument is a `jax.Array` (concrete or tracer — tracers satisfy
the isinstance), the jax.numpy implementation runs; otherwise numpy runs.
Numpy-in → numpy-out keeps the verifier entirely on the host with zero
compile cost; under jit tracing everything traced stays traced (constants
computed by numpy fold into the graph, which XLA would do anyway).

Correctness notes: numpy 2.x (NEP 50) keeps uint64 + python-int at uint64,
and ARRAY integer overflow wraps silently mod 2^64 — exactly the behavior
the branchless Goldilocks kernels rely on (goldilocks.py). Keep verifier
values at ndim >= 1 (0-d numpy scalars warn on overflow).
"""

from __future__ import annotations

import jax
import jax.numpy as _jnp
import numpy as _np

# dtypes: numpy scalar types are valid dtype specs for BOTH engines
uint64 = _np.uint64
uint32 = _np.uint32
int64 = _np.int64
int32 = _np.int32
ndarray = _jnp.ndarray  # annotation alias (covers the device case)


import os as _os


def hard_sync(x) -> None:
    """A device barrier that actually waits. jax.block_until_ready returns
    as soon as the tunneled-TPU transport ACKs the enqueue — it does NOT
    wait for execution. The streaming commit, Merkle leaf-block, opening
    matvec and block-composition loops use the barrier to bound how many
    blocks' program temps coexist on the chip; over the tunnel the no-op
    barrier let every block enqueue at once and OOM'd the 2^19 north-star
    runs. A one-element dependent readback forces real completion (device
    streams execute in-order). On local backends the plain barrier is
    cheaper and sufficient.

    The forced-readback choice keys on the ARRAY'S OWN device platform, not
    on a transport env var (ADVICE r3): a JAX_PLATFORMS=cpu process with the
    tunnel var still set gets the cheap local barrier, and any tunnel
    configured through a different variable still gets the real readback."""
    if isinstance(x, _np.ndarray):
        return
    try:
        local = all(d.platform in ("cpu", "gpu") for d in x.devices())
    except Exception:  # tracers / committed-less arrays: be conservative
        local = False
    if local:
        jax.block_until_ready(x)
    else:
        _np.asarray(_jnp.reshape(x, (-1,))[:1])


def _any_jax(args) -> bool:
    for a in args:
        if isinstance(a, jax.Array):
            return True
        if isinstance(a, (list, tuple)):
            if _any_jax(a):
                return True
    return False


def _dispatch(name, np_name=None):
    jf = getattr(_jnp, name)
    nf = getattr(_np, np_name or name)

    def f(*args, **kwargs):
        if _any_jax(args):
            return jf(*args, **kwargs)
        return nf(*args, **kwargs)

    f.__name__ = name
    return f


where = _dispatch("where")
stack = _dispatch("stack")
concatenate = _dispatch("concatenate")
zeros_like = _dispatch("zeros_like")
ones_like = _dispatch("ones_like")
pad = _dispatch("pad")
sum = _dispatch("sum")
roll = _dispatch("roll")
flip = _dispatch("flip")
broadcast_to = _dispatch("broadcast_to")
expand_dims = _dispatch("expand_dims")


def asarray(x, dtype=None):
    """numpy-in -> numpy-out; jax/tracer-in -> jax. Explicitly NOT a device
    transfer: prover-side materialization must use jax.numpy directly."""
    if _any_jax((x,)):
        return _jnp.asarray(x, dtype=dtype)
    return _np.asarray(x, dtype=dtype)


# creation routines have no array inputs to dispatch on: default to numpy
# (a later op against a jax array auto-promotes; under tracing they are
# constants either way). Code that needs a DEVICE zeros must call jnp.
zeros = _np.zeros
ones = _np.ones
arange = _np.arange


def at_set(arr, idx, value):
    """arr.at[idx].set(value) that also works on numpy arrays."""
    if isinstance(arr, jax.Array):
        return arr.at[idx].set(value)
    out = _np.array(arr, copy=True)
    out[idx] = value
    return out


def at_add(arr, idx, value):
    """arr.at[idx].add(value) that also works on numpy arrays (wrapping u64
    add, same semantics both engines)."""
    if _any_jax((arr, value)):
        return _jnp.asarray(arr).at[idx].add(value)
    out = _np.array(arr, copy=True)
    out[idx] += value
    return out
