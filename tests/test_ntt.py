"""NTT / coset-LDE tests against naive Python-int evaluation."""

import numpy as np

from starky_bn254_tpu import goldilocks as gl
from starky_bn254_tpu import ntt

RNG = np.random.default_rng(1)


def rand_col(n):
    return np.array(
        [int(RNG.integers(0, 1 << 62)) % gl.P for _ in range(n)], dtype=np.uint64
    )


def naive_ntt(col, inverse=False):
    n = len(col)
    log_n = n.bit_length() - 1
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, gl.P - 2, gl.P)
    out = []
    for j in range(n):
        acc = 0
        wj = pow(w, j, gl.P)
        x = 1
        for t in range(n):
            acc = (acc + int(col[t]) * x) % gl.P
            x = x * wj % gl.P
        if inverse:
            acc = acc * pow(n, gl.P - 2, gl.P) % gl.P
        out.append(acc)
    return out


def test_ntt_forward_small():
    for log_n in [0, 1, 2, 4, 6]:
        n = 1 << log_n
        col = rand_col(n)
        got = [int(v) for v in np.asarray(ntt.ntt(gl.u64(col)))]
        assert got == naive_ntt(col), f"n={n}"


def test_ntt_roundtrip():
    n = 256
    cols = np.stack([rand_col(n), rand_col(n)], axis=1)
    x = gl.u64(cols)
    back = ntt.ntt(ntt.ntt(x), inverse=True)
    assert np.array_equal(np.asarray(back), cols)


def test_ntt_inverse_small():
    n = 16
    col = rand_col(n)
    got = [int(v) for v in np.asarray(ntt.ntt(gl.u64(col), inverse=True))]
    assert got == naive_ntt(col, inverse=True)


def test_coset_lde_evaluations():
    # LDE values must equal the interpolated polynomial evaluated at
    # shift * w_big^i.
    n, rate_bits = 8, 1
    col = rand_col(n)
    lde = np.asarray(ntt.coset_lde(gl.u64(col), rate_bits))
    coeffs = naive_ntt(col, inverse=True)  # wait: this is evals->? no

    # interpolate coefficients from subgroup evals: coeffs = INTT(evals)
    coeffs = naive_ntt(col, inverse=True)
    big_n = n << rate_bits
    w_big = gl.primitive_root_of_unity(big_n.bit_length() - 1)
    shift = gl.GENERATOR
    for i in range(big_n):
        x = shift * pow(w_big, i, gl.P) % gl.P
        want = 0
        for k in reversed(range(n)):
            want = (want * x + coeffs[k]) % gl.P
        assert int(lde[i]) == want, f"i={i}"


def test_eval_poly_ext():
    n = 16
    col = rand_col(n)
    coeffs = ntt.interpolate_coeffs(gl.u64(col))
    point = gl.ext(gl.u64(12345), gl.u64(678))
    got = np.asarray(ntt.eval_poly_ext(coeffs, point))
    # naive extension Horner
    c = [int(v) for v in np.asarray(coeffs)]
    acc = (0, 0)
    pt = (12345, 678)
    for k in reversed(range(n)):
        acc = (
            (acc[0] * pt[0] + gl.W * acc[1] * pt[1] + c[k]) % gl.P,
            (acc[0] * pt[1] + acc[1] * pt[0]) % gl.P,
        )
    assert (int(got[0]), int(got[1])) == acc
