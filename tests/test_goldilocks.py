"""Goldilocks field unit tests against exact Python-int arithmetic."""

import numpy as np
import pytest

from starky_bn254_tpu import goldilocks as gl

RNG = np.random.default_rng(0)


def rand_elems(n):
    # Random canonical values, biased to include boundary cases.
    vals = [0, 1, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32, (1 << 63)]
    vals += [
        int(RNG.integers(0, 1 << 62)) * 4 % gl.P for _ in range(n - len(vals))
    ]
    return np.array(vals[:n], dtype=np.uint64)


A = rand_elems(64)
B = rand_elems(64)[::-1].copy()


def as_int(x):
    return [int(v) for v in np.asarray(x, dtype=np.uint64)]


def test_add():
    got = as_int(gl.add(gl.u64(A), gl.u64(B)))
    want = [(int(a) + int(b)) % gl.P for a, b in zip(A, B)]
    assert got == want


def test_sub():
    got = as_int(gl.sub(gl.u64(A), gl.u64(B)))
    want = [(int(a) - int(b)) % gl.P for a, b in zip(A, B)]
    assert got == want


def test_neg():
    got = as_int(gl.neg(gl.u64(A)))
    want = [(-int(a)) % gl.P for a in A]
    assert got == want


def test_mul():
    got = as_int(gl.mul(gl.u64(A), gl.u64(B)))
    want = [(int(a) * int(b)) % gl.P for a, b in zip(A, B)]
    assert got == want


def test_mul_const():
    for c in [0, 1, 7, 0xFFFF, (1 << 32) - 1]:
        got = as_int(gl.mul_const(gl.u64(A), c))
        want = [(int(a) * c) % gl.P for a in A]
        assert got == want


def test_inv():
    a = gl.u64(A)
    got = as_int(gl.mul(a, gl.inv(a)))
    want = [0 if int(x) == 0 else 1 for x in A]
    assert got == want


def test_batch_inv():
    a = gl.u64(np.concatenate([A, np.zeros(3, dtype=np.uint64)]))
    got = as_int(gl.batch_inv(a))
    want = [pow(int(x), gl.P - 2, gl.P) if int(x) != 0 else 0 for x in as_int(a)]
    assert got == want


def test_pow_const():
    a = gl.u64(A)
    for e in [0, 1, 2, 5, gl.P - 2]:
        got = as_int(gl.pow_const(a, e))
        want = [pow(int(x), e, gl.P) for x in A]
        assert got == want


def test_roots_of_unity():
    for log_n in [0, 1, 4, 16, 32]:
        w = gl.primitive_root_of_unity(log_n)
        assert pow(w, 1 << log_n, gl.P) == 1
        if log_n > 0:
            assert pow(w, 1 << (log_n - 1), gl.P) == gl.P - 1


def ext_int(x):
    arr = np.asarray(x, dtype=np.uint64)
    return [(int(c0), int(c1)) for c0, c1 in arr.reshape(-1, 2)]


def ext_mul_int(a, b):
    a0, a1 = a
    b0, b1 = b
    return (
        (a0 * b0 + gl.W * a1 * b1) % gl.P,
        (a0 * b1 + a1 * b0) % gl.P,
    )


def test_ext_mul_inv():
    ea = gl.ext(gl.u64(A), gl.u64(B))
    eb = gl.ext(gl.u64(B), gl.u64(A))
    got = ext_int(gl.ext_mul(ea, eb))
    want = [ext_mul_int(x, y) for x, y in zip(ext_int(ea), ext_int(eb))]
    assert got == want

    prod = gl.ext_mul(ea, gl.ext_inv(ea))
    for (c0, c1), (a0, a1) in zip(ext_int(prod), ext_int(ea)):
        if (a0, a1) == (0, 0):
            continue
        assert (c0, c1) == (1, 0)


def test_ext_pow():
    ea = gl.ext(gl.u64(A[:8]), gl.u64(B[:8]))
    got = ext_int(gl.ext_pow_const(ea, 11))
    want = []
    for x in ext_int(ea):
        acc = (1, 0)
        for _ in range(11):
            acc = ext_mul_int(acc, x)
        want.append(acc)
    assert got == want


def test_w_nonresidue():
    # X^2 - W must be irreducible
    assert pow(gl.W, (gl.P - 1) // 2, gl.P) == gl.P - 1
