"""Pallas TPU kernels for the hot compute paths.

TPU has no native 64-bit integer datapath; XLA emulates u64 with u32 pairs
and, for the very deep straight-line graphs this framework generates
(Poseidon permutations, NTT butterfly chains), splits them into many fusions
that round-trip HBM between rounds (measured: one [2^20]-row Poseidon
permutation = 400 ms under XLA, ~14 GB of intermediate traffic at the
tunnel-effective ~42 GB/s). These kernels keep a row tile resident in VMEM
through the whole round chain and do the u32-pair field arithmetic
explicitly (u64ops), eliminating that traffic.

Everything here is optional: callers gate on `available()` and fall back to
the XLA path (bit-identical results either way — both produce canonical
Goldilocks residues).
"""

import contextlib as _contextlib
import sys as _sys
import threading as _threading

# Mosaic lowers long straight-line kernel bodies recursively; a 30-round
# permutation chain exceeds CPython's default 1000-frame limit.
if _sys.getrecursionlimit() < 20_000:
    _sys.setrecursionlimit(20_000)

from . import u64ops  # noqa: F401

_local = _threading.local()


def mesh_pallas_enabled() -> bool:
    """Opt-in: dispatch Pallas kernels INSIDE shard_map bodies.

    The sharded pipeline historically guarded every shard_map body with
    xla_only() because pallas_call's out_shapes carry no varying-manual-axes
    annotation, which shard_map's default check_vma rejects. With
    STARKY_MESH_PALLAS=1 the sharded commits instead pass check_vma=False
    and let the per-shard body trace the same Pallas NTT/sponge kernels the
    single-chip path uses (local shard shapes; bit-identical results —
    validated on a real-chip 1-device mesh, see PARALLEL.md)."""
    import os

    return os.environ.get("STARKY_MESH_PALLAS", "") == "1"


def xla_only_active() -> bool:
    """True while tracing a region that must not dispatch Pallas kernels."""
    return getattr(_local, "xla_only", 0) > 0


@_contextlib.contextmanager
def xla_only():
    """Disable Pallas dispatch for code traced inside this context.

    Needed around `jax.shard_map` bodies: `pallas_call`'s output
    ShapeDtypeStructs carry no `vma` annotation, which shard_map's
    check_vma rejects outright — and the sharded pipeline's correctness
    contract is bit-identity with the single-chip XLA path anyway.
    Per-shard Pallas dispatch on a real TPU mesh is a future optimization
    (it needs vma-annotated out_shapes)."""
    _local.xla_only = getattr(_local, "xla_only", 0) + 1
    try:
        yield
    finally:
        _local.xla_only -= 1
