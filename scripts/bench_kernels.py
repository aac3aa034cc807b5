"""Microbenchmarks for the TPU hot-path kernels: Pallas vs XLA, with a
roofline column (achieved HBM GB/s vs chip peak).

Measures (a) Poseidon sponge absorb, (b) the NTT, (c) the FRI fold step,
(d) a full streaming trace commit, at the north-star-adjacent shape
[2^19..2^20 rows x 120 cols]. Timings force a host readback of a value
derived from the output because jax.block_until_ready does not actually
wait over the axon tunnel.

The roofline model counts MINIMUM HBM traffic for each op (read inputs
once + write outputs once, per algorithmic pass) against the chip's peak
HBM bandwidth (env STARKY_PEAK_GBPS; default 819 GB/s, TPU v5e). The
sponge is compute-bound, not bandwidth-bound, so its % -of-peak is the
bandwidth floor, not the binding roof; the NTT and fold are
bandwidth-bound and their % is the real efficiency.

Usage: python scripts/bench_kernels.py [log_rows] [cols]
"""

import os
import sys
import time

PEAK_GBPS = float(os.environ.get("STARKY_PEAK_GBPS", "819"))


def roofline(name, n_bytes, secs):
    gbps = n_bytes / secs / 1e9
    return f"{gbps:.0f} GB/s = {100 * gbps / PEAK_GBPS:.0f}% of {PEAK_GBPS:.0f} peak"

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

    sponge_bytes = n * (block.shape[1] + 2 * poseidon.WIDTH) * 8
    if pk.available():
        t_pal = timeit(lambda: sync(pk.sponge_absorb(state, block, tile=512)))
        print(f"sponge [{n}x{block.shape[1]}]: xla {t_xla*1e3:.0f} ms, "
              f"pallas {t_pal*1e3:.0f} ms ({t_xla/t_pal:.2f}x); "
              f"{roofline('sponge', sponge_bytes, t_pal)} "
              f"(compute-bound: {n * block.shape[1] / 8 / t_pal / 1e6:.1f} "
              f"M poseidon-perm/s)", flush=True)
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
        # 3 algorithmic HBM passes (K1, gather, K2), each read+write
        ntt_bytes = 6 * n * xp.shape[1] * 8
        print(f"ntt    [{n}x{cols}]: xla {t_xla*1e3:.0f} ms, "
              f"pallas {t_pal*1e3:.0f} ms/{xp.shape[1]}c ({t_xla/t_pal:.2f}x); "
              f"3-pass model {roofline('ntt', ntt_bytes, t_pal)}",
              flush=True)
    else:
        print(f"ntt xla {t_xla*1e3:.0f} ms (no pallas backend)", flush=True)

    # --- FRI arity-4 fold step on [n*2, 2] extension values
    from starky_bn254_tpu.stark import fri as fri_mod

    m = 2 * n
    fv = jnp.asarray(rng.integers(0, gl.P, (m, 2), dtype=np.uint64))
    beta = jnp.asarray(np.array([3, 5], dtype=np.uint64))
    w_m_inv = jnp.asarray(np.uint64(
        pow(gl.primitive_root_of_unity(m.bit_length() - 1), gl.P - 2, gl.P)))
    s_inv = jnp.asarray(np.uint64(pow(gl.GENERATOR, gl.P - 2, gl.P)))
    jax.block_until_ready(fv)
    t_fold = timeit(lambda: sync(fri_mod._fold_step4(fv, beta, w_m_inv, s_inv)))
    fold_bytes = (m * 2 + m // 2) * 8  # read all, write m/4 ext values
    print(f"fold4  [{m}x2]: {t_fold*1e3:.1f} ms; "
          f"{roofline('fold', fold_bytes, t_fold)}", flush=True)

    # --- full commit (LDE + leaf hash + tree) via the streaming path
    from starky_bn254_tpu.stark.config import StarkConfig
    from starky_bn254_tpu.stark.prover import commit

    cfg = StarkConfig.standard_fast_config()
    try:
        t_commit = timeit(lambda: sync(commit(x, cfg).tree.cap), reps=2)
    except Exception as e:  # keep the earlier tiers' rows on a crash
        print(f"commit [{n}x{cols}]: FAILED ({type(e).__name__}: "
              f"{str(e)[:160]})", flush=True)
        return
    # INTT 3 passes at [n,c] + coset NTT 3 passes at [2n,c] + leaf-hash read
    # + LDE writeback: ~22*n*c*8 bytes end to end
    commit_bytes = 22 * n * cols * 8
    print(f"commit [{n}x{cols}] -> lde 2^{log_rows+1}: {t_commit:.2f} s; "
          f"pipeline model {roofline('commit', commit_bytes, t_commit)}",
          flush=True)


if __name__ == "__main__":
    main()
