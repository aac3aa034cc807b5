"""One recorded prove+verify per heavy family under standard_fast_config
(84 queries, 16-bit PoW) at num_io >= 4 — VERDICT r2 item 6; the reference
round-trips these families under its production config
(/root/reference/src/curves/g2/exp.rs:837-895).

Usage: python scripts/heavy_standard_config.py [g2|fq12|fq12u64]
Prints one JSON line per family.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import starky_bn254_tpu  # noqa: E402, F401
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from starky_bn254_tpu import bn254  # noqa: E402
from starky_bn254_tpu.stark import StarkConfig, prove, verify  # noqa: E402
from starky_bn254_tpu.utils.timing import TimingTree  # noqa: E402

RNG = np.random.default_rng(9)
NUM_IO = int(os.environ.get("HEAVY_NUM_IO", "4"))


def rand_scalar():
    return int.from_bytes(RNG.bytes(40), "little") % bn254.R_BN


def rand_fq12():
    return bn254.Fq12.from_fq_list(
        [int.from_bytes(RNG.bytes(40), "little") % bn254.P_BN for _ in range(12)]
    )


def run(family: str):
    cfg = StarkConfig.standard_fast_config()
    if family == "g2":
        from starky_bn254_tpu.airs.g2_exp import G2ExpAir

        air = G2ExpAir(NUM_IO)
        inputs = [
            (
                bn254.g2_mul(bn254.G2_GEN, rand_scalar()),
                bn254.g2_mul(bn254.G2_GEN, rand_scalar()),
                rand_scalar(),
            )
            for _ in range(NUM_IO)
        ]
    elif family == "fq12":
        from starky_bn254_tpu.airs.fq12_exp import Fq12ExpAir

        air = Fq12ExpAir(NUM_IO, range_check="logup")
        inputs = [(rand_fq12(), rand_fq12(), rand_scalar()) for _ in range(NUM_IO)]
    else:
        from starky_bn254_tpu.airs.fq12_exp_u64 import Fq12ExpU64Air

        air = Fq12ExpU64Air(NUM_IO, range_check="logup")
        inputs = [
            (rand_fq12(), rand_fq12(), int(RNG.integers(0, 1 << 63)))
            for _ in range(NUM_IO)
        ]

    t0 = time.time()
    trace, pi = air.generate_trace_and_pi(inputs)
    t_tracegen = time.time() - t0
    t0 = time.time()
    proof = prove(air, jnp.asarray(trace), pi, cfg)
    t_first = time.time() - t0
    # warm re-prove: steady-state number once the layout's programs exist
    tt = TimingTree("prove", sync=True)
    t0 = time.time()
    proof = prove(air, jnp.asarray(trace), pi, cfg, timing=tt)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = verify(air, proof, cfg)
    t_verify = time.time() - t0
    assert ok
    print(
        json.dumps(
            {
                "metric": f"{family}_exp_standard_config_prove_s",
                "value": round(t_prove, 2),
                "unit": "s",
                "vs_baseline": 1.0,
                "detail": {
                    "num_io": NUM_IO,
                    "rows": int(trace.shape[0]),
                    "columns": int(trace.shape[1]),
                    "config": "standard_fast (rate 1/2, 84 queries, 16-bit PoW)",
                    "trace_gen_s": round(t_tracegen, 2),
                    "prove_first_s": round(t_first, 2),
                    "instances_per_s": round(NUM_IO / t_prove, 3),
                    "verify_s": round(t_verify, 2),
                    "phases": tt.as_dict(),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "g2")
