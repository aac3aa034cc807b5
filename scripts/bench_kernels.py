"""Microbenchmarks for the TPU hot-path kernels: Pallas vs XLA.

Measures (a) Poseidon sponge absorb, (b) the NTT, (c) a full streaming
trace commit, at the north-star-adjacent shape [2^19..2^20 rows x 120 cols].
Timings force a host readback of a value derived from the output because
jax.block_until_ready does not actually wait over the axon tunnel.

Usage: python scripts/bench_kernels.py [log_rows] [cols]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sync(x):
    """Force real completion over the tunnel: reduce + host readback."""
    import jax.numpy as jnp
    import numpy as np

    return np.asarray(jnp.max(x.reshape(-1)[:1024]))


def timeit(fn, reps=3):
    fn()  # warm/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    cols = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    n = 1 << log_rows

    import numpy as np

    import starky_bn254_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from starky_bn254_tpu import goldilocks as gl
    from starky_bn254_tpu import ntt, poseidon

    print(f"device: {jax.devices()[0]}  shape: [{n}, {cols}]", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, gl.P, (n, cols), dtype=np.uint64))
    state = jnp.zeros((n, poseidon.WIDTH), dtype=jnp.uint64)
    block = x[:, : (cols // poseidon.RATE) * poseidon.RATE]
    jax.block_until_ready((x, state, block))
    sync(x)

    # --- sponge absorb
    t_xla = timeit(lambda: sync(poseidon._sponge_absorb_xla(state, block)))
    from starky_bn254_tpu.pallas import poseidon_kernel as pk

    if pk.available():
        t_pal = timeit(lambda: sync(pk.sponge_absorb(state, block, tile=512)))
        print(f"sponge [{n}x{block.shape[1]}]: xla {t_xla*1e3:.0f} ms, "
              f"pallas {t_pal*1e3:.0f} ms ({t_xla/t_pal:.2f}x)", flush=True)
    else:
        print(f"sponge xla {t_xla*1e3:.0f} ms (no pallas backend)", flush=True)

    # --- NTT (pad cols to 128 like the dispatcher does)
    t_xla = timeit(lambda: sync(ntt._ntt_xla(x, False)))
    from starky_bn254_tpu.pallas import ntt_kernel as nk

    if nk.available():
        pad = (-cols) % 128
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        jax.block_until_ready(xp)
        t_pal = timeit(lambda: sync(nk.ntt2d(xp, False)))
        print(f"ntt    [{n}x{cols}]: xla {t_xla*1e3:.0f} ms, "
              f"pallas {t_pal*1e3:.0f} ms/{xp.shape[1]}c ({t_xla/t_pal:.2f}x)",
              flush=True)
    else:
        print(f"ntt xla {t_xla*1e3:.0f} ms (no pallas backend)", flush=True)

    # --- full commit (LDE + leaf hash + tree) via the streaming path
    from starky_bn254_tpu.stark.config import StarkConfig
    from starky_bn254_tpu.stark.prover import commit

    cfg = StarkConfig.standard_fast_config()
    t_commit = timeit(lambda: sync(commit(x, cfg).tree.cap), reps=2)
    print(f"commit [{n}x{cols}] -> lde 2^{log_rows+1}: {t_commit:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
