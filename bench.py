"""Benchmark: G1 scalar-multiplication proving throughput (the BASELINE.md
headline workload). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against this project's own recorded first measurement when available
(bench_baseline.json), else 1.0.

Env knobs: STARKY_BENCH_NUM_IO (default 16), STARKY_BENCH_AIR (g1|fq).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import starky_bn254_tpu  # noqa: F401, E402  (x64 + cache config)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from starky_bn254_tpu import bn254  # noqa: E402
from starky_bn254_tpu.stark import StarkConfig, prove, verify  # noqa: E402


def main():
    num_io = int(os.environ.get("STARKY_BENCH_NUM_IO", "16"))
    air_kind = os.environ.get("STARKY_BENCH_AIR", "g1")
    rng = np.random.default_rng(0)

    def rand_scalar():
        return int.from_bytes(rng.bytes(40), "little") % bn254.R_BN

    cfg = StarkConfig.standard_fast_config()

    t0 = time.time()
    if air_kind == "g1":
        from starky_bn254_tpu.airs.g1_exp import G1ExpAir

        air = G1ExpAir(num_io)
        inputs = [
            (
                bn254.g1_mul(bn254.G1_GEN, rand_scalar()),
                bn254.g1_mul(bn254.G1_GEN, rand_scalar()),
                rand_scalar(),
            )
            for _ in range(num_io)
        ]
        trace, pi = air.generate_trace_and_pi(inputs)
    else:
        from starky_bn254_tpu.airs.fq_exp import FqExpAir

        air = FqExpAir(num_io)

        def rand_fq():
            return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

        inputs = [(rand_fq(), rand_fq(), rand_scalar()) for _ in range(num_io)]
        trace, pi = air.generate_trace_and_pi(inputs)
    t_tracegen = time.time() - t0

    trace_dev = jnp.asarray(trace)
    jax.block_until_ready(trace_dev)

    # first prove includes compilation; second measures steady-state
    t0 = time.time()
    proof = prove(air, trace_dev, pi, cfg)
    t_first = time.time() - t0

    from starky_bn254_tpu.utils.timing import TimingTree

    tt = TimingTree("prove")
    t0 = time.time()
    proof = prove(air, trace_dev, pi, cfg, timing=tt)
    t_prove = time.time() - t0

    t0 = time.time()
    assert verify(air, proof, cfg)
    t_verify = time.time() - t0

    import tempfile

    from starky_bn254_tpu.stark import save_proof

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_proof(f.name, proof)
        proof_bytes = os.path.getsize(f.name)

    exps_per_s = num_io / t_prove
    baseline_file = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 1.0
    if os.path.exists(baseline_file):
        try:
            base = json.load(open(baseline_file))
            if base.get("metric", "").startswith(air_kind) and base.get("value"):
                vs = exps_per_s / float(base["value"])
        except Exception:
            pass

    result = {
        "metric": f"{air_kind}_exp_proof_instances_per_s",
        "value": round(exps_per_s, 4),
        "unit": "exp_instances/s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "num_io": num_io,
            "rows": int(trace.shape[0]),
            "columns": int(trace.shape[1]),
            "trace_gen_s": round(t_tracegen, 3),
            "prove_first_s": round(t_first, 3),
            "prove_s": round(t_prove, 3),
            "verify_s": round(t_verify, 3),
            "proof_bytes": proof_bytes,
            "phases": tt.as_dict(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
