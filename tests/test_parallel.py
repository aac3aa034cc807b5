"""Sharded pipeline must be bit-identical to the single-chip path."""

import jax
import jax.numpy as jnp
import numpy as np

from starky_bn254_tpu import merkle, ntt, poseidon
from starky_bn254_tpu.parallel import sharded

RNG = np.random.default_rng(21)


def test_sharded_commit_matches_single_chip():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = sharded.make_mesh(8)
    n, c, rate_bits, cap_height = 64, 16, 1, 1
    trace = jnp.asarray(RNG.integers(0, 1 << 16, size=(n, c), dtype=np.uint64))

    lde_rows, tree = sharded.sharded_commit(mesh, trace, rate_bits, cap_height)

    coeffs = ntt.interpolate_coeffs(trace)
    lde = ntt.lde_from_coeffs(coeffs, rate_bits)
    assert np.array_equal(np.asarray(lde_rows), np.asarray(lde))

    single = merkle.build_merkle_tree(lde, cap_height)
    assert np.array_equal(np.asarray(tree["cap"]), np.asarray(single.cap))


def test_sharded_composition_boundary_rows():
    mesh = sharded.make_mesh(8)
    n = 64
    blowup = 2
    rows = jnp.asarray(
        np.arange(n, dtype=np.uint64)[:, None] * np.ones((1, 3), dtype=np.uint64)
    )

    def eval_rows(lv, nv):
        # next-row difference; cyclically the last rows wrap to the first
        return nv[:, 0] - lv[:, 0]

    out = np.asarray(sharded.sharded_composition(mesh, eval_rows, rows, blowup))
    expect = np.roll(np.arange(n, dtype=np.uint64), -blowup) - np.arange(
        n, dtype=np.uint64
    )
    assert np.array_equal(out, expect)


def test_sharded_fri_fold_matches_single_chip():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from starky_bn254_tpu import goldilocks as gl
    from starky_bn254_tpu.parallel.sharded import make_mesh, sharded_fri_fold
    from starky_bn254_tpu.stark import fri

    mesh = make_mesh(8)
    rng = np.random.default_rng(6)
    m = 1 << 10
    values = jnp.asarray(rng.integers(0, 2**63, size=(m, 2)).astype(np.uint64))
    beta = (12345, 67890)
    w_m_inv = pow(gl.primitive_root_of_unity(10), gl.P - 2, gl.P)
    s_inv = pow(gl.GENERATOR, gl.P - 2, gl.P)
    want = fri._fold_step4(
        values,
        jnp.asarray(np.array(beta, dtype=np.uint64)),
        jnp.asarray(np.uint64(w_m_inv)),
        jnp.asarray(np.uint64(s_inv)),
    )
    got = sharded_fri_fold(mesh, values, beta, w_m_inv, s_inv)
    assert got.shape == (m // 4, 2)
    assert (np.asarray(got) == np.asarray(want)).all()
