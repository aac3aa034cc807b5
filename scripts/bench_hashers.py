"""Chip microbench: Merkle leaf hashing throughput, Poseidon vs Keccak.

Usage: python scripts/bench_hashers.py [log2_rows] [cols]   (default 17 404
— the num_io=128 G1 commit shape). Prints one JSON line per hasher."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 404
    n = 1 << log_rows

    import numpy as np

    import starky_bn254_tpu  # noqa: F401
    import jax.numpy as jnp

    from starky_bn254_tpu.hashing import get_hasher

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 63, size=(n, cols), dtype=np.uint64))

    from starky_bn254_tpu.xnp import hard_sync

    for name in ["keccak", "poseidon"]:
        h = get_hasher(name)
        d = h.hash_or_noop(x)
        hard_sync(d)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            d = h.hash_or_noop(x)
            hard_sync(d)
        dt = (time.time() - t0) / reps
        perms = n * (-(-cols // h.RATE) + (1 if name == "keccak" else 0))
        print(
            json.dumps(
                {
                    "hasher": name,
                    "shape": [n, cols],
                    "leaf_hash_s": round(dt, 4),
                    "cells_per_s": round(n * cols / dt, 1),
                    "perm_per_s": round(perms / dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
