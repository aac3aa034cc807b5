"""Collective-op accounting for the sharded prove path (VERDICT r2 item 7).

Runs a full `prove(mesh=)` on the 8-device virtual CPU mesh with XLA HLO
dumping enabled, then tabulates the collective operations (all-to-all,
collective-permute, all-gather, all-reduce, reduce-scatter) each compiled
module actually contains after SPMD partitioning. Output: markdown table on
stdout (checked into PARALLEL.md).

Usage: python scripts/collectives_report.py [fq_mul|g1 [num_io]]
(default: fq_mul at 256 rows; `g1 16` runs the bench-class G1ExpAir shape)
"""

import collections
import glob
import os
import re
import shutil
import sys
import tempfile

DUMP = tempfile.mkdtemp(prefix="starky_xla_dump_")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count=8 --xla_dump_to={DUMP}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# dumping recompiles everything: use a throwaway cache namespace
os.environ["STARKY_JAX_CACHE"] = os.path.join(DUMP, "cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from starky_bn254_tpu import bn254  # noqa: E402
from starky_bn254_tpu.airs.fq_mul import FqMulAir  # noqa: E402
from starky_bn254_tpu.parallel.sharded import make_mesh  # noqa: E402
from starky_bn254_tpu.stark import StarkConfig, prove, verify  # noqa: E402

COLLECTIVES = (
    "all-to-all",
    "collective-permute",
    "all-gather",
    "all-reduce",
    "reduce-scatter",
)


def main():
    rng = np.random.default_rng(0)

    def fq():
        return int.from_bytes(rng.bytes(40), "little") % bn254.P_BN

    kind = sys.argv[1] if len(sys.argv) > 1 else "fq_mul"
    if kind == "g1":
        from starky_bn254_tpu.airs.g1_exp import G1ExpAir

        num_io = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        sc = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.R_BN
        g1p = lambda: bn254.g1_mul(bn254.G1_GEN, sc())
        air = G1ExpAir(num_io, range_check="logup")
        trace, pi = air.generate_trace_and_pi(
            [(g1p(), g1p(), sc()) for _ in range(num_io)]
        )
        print(f"workload: G1ExpAir num_io={num_io} trace {trace.shape}",
              file=sys.stderr)
    else:
        air = FqMulAir(256)
        trace = air.generate_trace([(fq(), fq()) for _ in range(250)])
        pi = np.zeros(0, dtype=np.uint64)
    cfg = StarkConfig.test_config()
    mesh = make_mesh(8)
    proof = prove(air, jnp.asarray(trace), pi, cfg, mesh=mesh)
    assert verify(air, proof, cfg)

    per_module = collections.defaultdict(collections.Counter)
    for path in glob.glob(os.path.join(DUMP, "*after_optimizations.txt")):
        name = os.path.basename(path)
        m = re.match(r"module_\d+\.(.*?)\.\d*\.?after_optimizations", name)
        mod = m.group(1) if m else name
        text = open(path).read()
        for c in COLLECTIVES:
            k = len(re.findall(rf"\b{re.escape(c)}(?:-start|-done)?\(", text))
            if c == "all-to-all":
                k += text.count(" all-to-all(") + text.count("all-to-all.")
            if k:
                per_module[mod][c] += k

    rows = []
    for mod, counts in sorted(per_module.items()):
        if not sum(counts.values()):
            continue
        rows.append((mod, counts))

    print("| compiled module | " + " | ".join(COLLECTIVES) + " |")
    print("|---|" + "---|" * len(COLLECTIVES))
    for mod, counts in rows:
        print(
            f"| `{mod}` | "
            + " | ".join(str(counts.get(c, 0)) for c in COLLECTIVES)
            + " |"
        )
    if not rows:
        print("(no collectives found — dump parsing failed?)")
    shutil.rmtree(DUMP, ignore_errors=True)


if __name__ == "__main__":
    main()
