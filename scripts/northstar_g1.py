"""North-star benchmark: one G1 scalar-mult STARK at large trace degree
(BASELINE.md: the 2^20-row AIR on one TPU chip).

Usage:
    python scripts/northstar_g1.py [log2_rows]   # default 19

num_io = 2^(log2_rows - 9) instances of 512 rows each; layout auto-selects
logup_u16 + rlc (404 main+lookup columns). Prints one JSON line compatible
with bench.py's schema.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    num_io = 1 << (log_rows - 9)

    import numpy as np

    import starky_bn254_tpu  # noqa: F401  (jax config)
    import jax
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.stark import StarkConfig, prove, verify
    from starky_bn254_tpu.utils.timing import TimingTree
    from starky_bn254_tpu.airs.g1_exp import G1ExpAir

    rng = np.random.default_rng(0)

    def rand_scalar():
        return int.from_bytes(rng.bytes(40), "little") % bn254.R_BN

    # STARKY_MERKLE_HASH=keccak selects the Keccak-f[1600] Merkle hash
    # (plonky2's KeccakGoldilocksConfig analogue — see keccak.py); the
    # emitted record carries the choice in detail.merkle_hash
    cfg = StarkConfig.standard_fast_config(
        os.environ.get("STARKY_MERKLE_HASH", "poseidon")
    )
    air = G1ExpAir(num_io)

    # RSS heartbeat: the round-5 2^20 attempt was host-OOM-killed at 130 GB
    # anon-RSS with no trace of WHICH phase ballooned — log it every 60 s
    import threading

    from starky_bn254_tpu.utils.memhygiene import rss_gb

    def _heartbeat():
        while True:
            time.sleep(60)
            print(
                f"[northstar] rss {rss_gb():.1f} GB +{time.time() - T0:.0f}s",
                file=sys.stderr,
                flush=True,
            )

    T0 = time.time()
    threading.Thread(target=_heartbeat, daemon=True).start()

    t0 = time.time()
    base_points = [bn254.g1_mul(bn254.G1_GEN, rand_scalar()) for _ in range(64)]
    inputs = [
        (base_points[i % 64], bn254.g1_mul(bn254.G1_GEN, rand_scalar()), rand_scalar())
        for i in range(num_io)
    ]
    t_inputs = time.time() - t0
    print(f"[northstar] inputs built in {t_inputs:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    trace, pi = air.generate_trace_and_pi(inputs)
    t_tracegen = time.time() - t0
    print(f"[northstar] trace {trace.shape} in {t_tracegen:.1f}s", file=sys.stderr, flush=True)

    # the host trace stays in numpy; each prove gets a FRESH device copy
    # bound only by prove's own local (which it drops after the aux build).
    # A caller-held device reference kept an extra [n, 404] u64 buffer live
    # through the aux commit and tipped 2^19 runs into RESOURCE_EXHAUSTED.
    n_proves = int(os.environ.get("NORTHSTAR_PROVES", 1))

    t0 = time.time()
    tt = TimingTree("prove", sync=True)
    proof = prove(air, jnp.asarray(trace), pi, cfg, timing=tt)
    t_first = time.time() - t0
    print(f"[northstar] first prove {t_first:.1f}s", file=sys.stderr, flush=True)
    t_prove = t_first

    if n_proves > 1:  # warm re-prove for steady-state numbers
        tt = TimingTree("prove", sync=True)
        t0 = time.time()
        proof = prove(air, jnp.asarray(trace), pi, cfg, timing=tt)
        t_prove = time.time() - t0
    del trace

    t0 = time.time()
    ok = verify(air, proof, cfg)
    t_verify = time.time() - t0
    assert ok

    print(
        json.dumps(
            {
                "metric": f"g1_exp_2^{log_rows}_rows_prove_s",
                "value": round(t_prove, 3),
                "unit": "s",
                "vs_baseline": 1.0,
                "detail": {
                    "num_io": num_io,
                    "rows": 1 << log_rows,
                    "columns": air.num_columns,
                    "instances_per_s": round(num_io / t_prove, 3),
                    "trace_gen_s": round(t_tracegen, 1),
                    "prove_first_s": round(t_first, 1),
                    "verify_s": round(t_verify, 1),
                    "phases": tt.as_dict(),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
