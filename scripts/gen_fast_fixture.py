"""Regenerate the fast-tier proof fixture (tests/fixtures/). Run after any
transcript/layout change and commit the new fixture with it."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from starky_bn254_tpu import bn254  # noqa: E402
from starky_bn254_tpu.airs.fq_mul import FqMulAir  # noqa: E402
from starky_bn254_tpu.stark import StarkConfig, prove, save_proof, verify  # noqa: E402

rng = np.random.default_rng(42)
fq = lambda: int.from_bytes(rng.bytes(40), "little") % bn254.P_BN  # noqa: E731
air = FqMulAir(256)
trace = air.generate_trace([(fq(), fq()) for _ in range(250)])
cfg = StarkConfig.test_config()
proof = prove(air, jnp.asarray(trace), np.zeros(0, dtype=np.uint64), cfg)
assert verify(air, proof, cfg)
out = os.path.join(REPO, "tests", "fixtures", "fq_mul_256_test_config.npz")
save_proof(out, proof)
print("saved", out, os.path.getsize(out), "bytes")
