"""Function-level wall-clock accounting of a warm prove (per-phase timing
plus the inter-phase host/transcript costs the TimingTree scopes miss).

Wraps the transcript, selector, opening and commit entry points with
cumulative timers, runs one instrumented warm prove, and prints the table.
Usage: python scripts/profile_prove.py [num_io]   (G1ExpAir; default 128)
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    num_io = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    import numpy as np

    import starky_bn254_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.g1_exp import G1ExpAir
    from starky_bn254_tpu.stark import StarkConfig, prove
    from starky_bn254_tpu.utils.timing import TimingTree

    rng = np.random.default_rng(0)
    sc = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.R_BN
    cfg = StarkConfig.standard_fast_config()
    air = G1ExpAir(num_io)
    inputs = [
        (bn254.g1_mul(bn254.G1_GEN, sc()), bn254.g1_mul(bn254.G1_GEN, sc()), sc())
        for _ in range(num_io)
    ]
    trace, pi = air.generate_trace_and_pi(inputs)
    trace_dev = jnp.asarray(trace)
    jax.block_until_ready(trace_dev)

    t0 = time.time()
    prove(air, trace_dev, pi, cfg)
    print(f"first prove {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    prove(air, trace_dev, pi, cfg)
    print(f"warm prove (no instrumentation) {time.time() - t0:.2f}s", flush=True)

    TOT = {}

    def wrap(obj, name, label):
        fn = getattr(obj, name)

        @functools.wraps(fn)
        def g(*a, **k):
            t = time.time()
            r = fn(*a, **k)
            TOT[label] = TOT.get(label, 0) + time.time() - t
            return r

        setattr(obj, name, g)

    from starky_bn254_tpu import challenger as chmod
    from starky_bn254_tpu import merkle as mk
    from starky_bn254_tpu import ntt as ntt_mod
    from starky_bn254_tpu.stark import composition as comp
    from starky_bn254_tpu.stark import fri as fmod
    from starky_bn254_tpu.stark import logup as lg
    from starky_bn254_tpu.stark import prover as pmod

    wrap(chmod.Challenger, "observe_cap", "challenger.observe_cap")
    wrap(chmod.Challenger, "observe_elements", "challenger.observe_elements")
    wrap(chmod.Challenger, "get_n_challenges", "challenger.get_n_challenges")
    wrap(chmod.Challenger, "get_ext_challenge", "challenger.get_ext_challenge")
    wrap(chmod.Challenger, "get_indices", "challenger.get_indices")
    wrap(pmod, "_ext_inv_x_minus", "prover.inv_x_minus")
    wrap(pmod, "compute_z_columns", "prover.z_columns")
    wrap(pmod, "_batch_opening_poly", "prover.batch_open_poly")
    wrap(pmod, "_lde_selectors", "prover.lde_selectors")
    wrap(ntt_mod, "eval_from_lde", "ntt.eval_from_lde")
    wrap(ntt_mod, "interpolate_coeffs", "ntt.interpolate_coeffs")
    wrap(ntt_mod, "interpolate_coset", "ntt.interpolate_coset")
    wrap(ntt_mod, "lde_from_coeffs", "ntt.lde_from_coeffs")
    wrap(mk, "build_merkle_tree", "merkle.build_tree")
    wrap(fmod, "grind", "fri.grind")
    wrap(lg, "compute_logup_columns", "logup.columns")
    wrap(comp, "evaluate_composition", "composition.eval")

    tt = TimingTree("prove", sync=True)
    t0 = time.time()
    prove(air, trace_dev, pi, cfg, timing=tt)
    wall = time.time() - t0
    print(f"instrumented (sync-barrier) prove {wall:.2f}s", flush=True)
    for k, v in sorted(TOT.items(), key=lambda x: -x[1]):
        print(f"{k:32s} {v * 1e3:8.1f} ms")
    print(json.dumps(tt.as_dict()))


if __name__ == "__main__":
    main()
