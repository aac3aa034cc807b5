"""Real-chip validation of mesh-Pallas mode (STARKY_MESH_PALLAS=1).

Runs the sharded prove on a 1-device TPU mesh — shard_map machinery, the
check_vma=False commits, and Mosaic lowering of the Pallas NTT/sponge
kernels INSIDE the shard_map bodies all engage exactly as they would on a
pod — and byte-compares the proof against the plain single-chip prove.
Prints one JSON line.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    assert os.environ.get("STARKY_MESH_PALLAS") == "1", (
        "run with STARKY_MESH_PALLAS=1"
    )
    import numpy as np

    import starky_bn254_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from starky_bn254_tpu import bn254
    from starky_bn254_tpu.airs.g1_exp import G1ExpAir
    from starky_bn254_tpu.parallel.sharded import make_mesh
    from starky_bn254_tpu.stark import StarkConfig, prove, verify
    from starky_bn254_tpu.stark.proof import proof_to_bytes

    assert jax.devices()[0].platform == "tpu", jax.devices()

    rng = np.random.default_rng(0)

    def sc():
        return int.from_bytes(rng.bytes(40), "little") % bn254.R_BN

    num_io = int(os.environ.get("MESH_PALLAS_NUM_IO", "16"))
    air = G1ExpAir(num_io, range_check="split")
    inputs = [
        (bn254.g1_mul(bn254.G1_GEN, sc()), bn254.g1_mul(bn254.G1_GEN, sc()), sc())
        for _ in range(num_io)
    ]
    cfg = StarkConfig.standard_fast_config()
    trace, pi = air.generate_trace_and_pi(inputs)
    trace_dev = jnp.asarray(trace)

    t0 = time.time()
    single = prove(air, trace_dev, pi, cfg)
    t_single = time.time() - t0

    mesh = make_mesh(1)
    t0 = time.time()
    sharded = prove(air, trace_dev, pi, cfg, mesh=mesh)
    t_mesh = time.time() - t0

    identical = proof_to_bytes(single) == proof_to_bytes(sharded)
    ok = verify(air, sharded, cfg)
    print(
        json.dumps(
            {
                "metric": "mesh_pallas_1dev_byte_identical",
                "value": int(identical),
                "unit": "bool",
                "vs_baseline": 1.0,
                "detail": {
                    "num_io": num_io,
                    "rows": int(trace.shape[0]),
                    "verify_ok": bool(ok),
                    "single_prove_s": round(t_single, 2),
                    "mesh_prove_s": round(t_mesh, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )
    assert identical and ok


if __name__ == "__main__":
    main()
