"""The TimingTree sync barrier must charge a scope for work it dispatched
but did not await (VERDICT r4 weak #8: the fresh-constant barrier is
load-bearing for every honest phase number — pin that it actually waits)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from starky_bn254_tpu.utils.timing import TimingTree
from starky_bn254_tpu.xnp import hard_sync


@jax.jit
def _heavy(x):
    for _ in range(200):
        x = (x * np.uint64(6364136223846793005) + np.uint64(1)) ^ (x >> np.uint64(17))
    return x


def test_sync_scope_charges_unawaited_dispatch():
    x = jnp.arange(1 << 20, dtype=jnp.uint64)
    y = _heavy(x)  # compile
    hard_sync(y)
    # true cost of one call, explicitly awaited
    t0 = time.time()
    hard_sync(_heavy(x))
    true_cost = time.time() - t0

    tt = TimingTree("t", sync=True)
    with tt.scope("dispatch-only"):
        _heavy(x)  # NOT awaited inside the scope
    tt.finish()
    ms = tt.as_dict()["children"][0]["ms"]
    # the scope's exit barrier must have waited for the dispatched work
    # (generous 30% floor: scheduling noise on a shared 4-core host)
    assert ms >= 0.3 * true_cost * 1000, (ms, true_cost)
