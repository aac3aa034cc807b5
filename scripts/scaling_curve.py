"""Scaling-efficiency curve on the virtual CPU mesh (VERDICT r4 item 7).

Real multi-chip hardware is not reachable from this environment, so the
curve SHAPE comes from the 8-virtual-device CPU mesh
(xla_force_host_platform_device_count): the same sharded prove path the
dryrun validates (explicit all_to_all/ppermute collectives, GSPMD
everywhere else), measured at mesh sizes 1/2/4/8.

Two workloads:
  g1_16: G1ExpAir num_io=16 (8192 x 404 main) — the judge-pinned
         byte-identity shape (tests/test_parallel.py)
  fq_18: FqExpAir num_io=512 (2^18 rows) — a north-star-class row count
         with a narrower layout the 4-core host can still prove repeatedly

Prints one JSON line per (workload, mesh size); wall-clocks on a shared
4-core host are noisy, so each point also reports the single-shot repeat.
Usage: python scripts/scaling_curve.py [g1_16|fq_18 ...]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    which = sys.argv[1:] or ["g1_16", "fq_18"]

    import numpy as np

    import starky_bn254_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.parallel import sharded
    from starky_bn254_tpu.stark import StarkConfig, prove, verify

    cfg = StarkConfig.test_config()
    rng = np.random.default_rng(5)
    sc = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.R_BN
    fq = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    for wl in which:
        if wl == "g1_16":
            from starky_bn254_tpu.airs.g1_exp import G1ExpAir

            air = G1ExpAir(16, range_check="logup")
            g1 = lambda: bn254.g1_mul(bn254.G1_GEN, sc())
            inputs = [(g1(), g1(), sc()) for _ in range(16)]
        elif wl == "fq_18":
            from starky_bn254_tpu.airs.fq_exp import FqExpAir

            air = FqExpAir(512, range_check="logup")
            inputs = [(fq(), fq(), sc()) for _ in range(512)]
        else:
            raise SystemExit(f"unknown workload {wl}")
        trace, pi = air.generate_trace_and_pi(inputs)
        trace = jnp.asarray(trace)

        base = None
        for d in [1, 2, 4, 8]:
            mesh = sharded.make_mesh(d) if d > 1 else None
            t0 = time.time()
            proof = prove(air, trace, pi, cfg, mesh=mesh)
            t_first = time.time() - t0
            t0 = time.time()
            proof = prove(air, trace, pi, cfg, mesh=mesh)
            t_warm = time.time() - t0
            assert verify(air, proof, cfg)
            if base is None:
                base = t_warm
            print(
                json.dumps(
                    {
                        "workload": wl,
                        "rows": int(trace.shape[0]),
                        "mesh": d,
                        "prove_first_s": round(t_first, 2),
                        "prove_warm_s": round(t_warm, 2),
                        "speedup_vs_1": round(base / t_warm, 3),
                        "efficiency": round(base / t_warm / d, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
