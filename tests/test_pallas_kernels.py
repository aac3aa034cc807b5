"""Bit-identity of the Pallas TPU kernels against the XLA reference paths.

The kernels run on CPU here via the Pallas interpreter (interpret=True),
which executes the exact kernel jaxpr; on real TPU hardware the same code
is pinned by scripts/ benches (the results are canonical residues either
way, so agreement on CPU + the field-op unit tests imply agreement on TPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from starky_bn254_tpu import goldilocks as gl
from starky_bn254_tpu import poseidon
from starky_bn254_tpu.pallas import u64ops as u
from starky_bn254_tpu.pallas import poseidon_kernel as pk

RNG = np.random.default_rng(7)
_SPECIAL = np.array(
    [0, 1, 2, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
     gl.P - (1 << 32), gl.EPSILON, 0xFFFF, 0x10000],
    dtype=np.uint64,
)


def _operands(n=1 << 14):
    a = np.concatenate([RNG.integers(0, gl.P, n, dtype=np.uint64),
                        _SPECIAL, _SPECIAL[::-1]])
    b = np.concatenate([RNG.integers(0, gl.P, n, dtype=np.uint64),
                        _SPECIAL[::-1], _SPECIAL])
    return jnp.asarray(a), jnp.asarray(b)


class TestU64Ops:
    @pytest.mark.parametrize(
        "glf,uf",
        [(gl.add, u.addmod), (gl.sub, u.submod), (gl.mul, u.mulmod)],
        ids=["add", "sub", "mul"],
    )
    def test_binary_op_matches_goldilocks(self, glf, uf):
        a, b = _operands()
        want = np.asarray(glf(a, b))
        got = np.asarray(u.join_u64(*uf(*u.split_u64(a), *u.split_u64(b))))
        assert (want == got).all()

    def test_sbox(self):
        a, _ = _operands()
        want = np.asarray(poseidon._sbox(a))
        got = np.asarray(u.join_u64(*u.sbox7(*u.split_u64(a))))
        assert (want == got).all()

    def test_mul32_exact(self):
        a = RNG.integers(0, 1 << 32, 1 << 12, dtype=np.uint32)
        b = RNG.integers(0, 1 << 32, 1 << 12, dtype=np.uint32)
        lo, hi = u.mul32(jnp.asarray(a), jnp.asarray(b))
        full = a.astype(np.uint64) * b.astype(np.uint64)
        assert (np.asarray(lo) == (full & 0xFFFFFFFF).astype(np.uint32)).all()
        assert (np.asarray(hi) == (full >> 32).astype(np.uint32)).all()


class TestSpongeKernel:
    @pytest.mark.parametrize("cols", [8, 24, 40], ids=lambda c: f"cols{c}")
    def test_bit_identical_to_xla_sponge(self, cols):
        n = 1024
        state = RNG.integers(0, gl.P, size=(n, 12), dtype=np.uint64)
        block = RNG.integers(0, gl.P, size=(n, cols), dtype=np.uint64)
        want = np.asarray(
            poseidon._sponge_absorb_xla(jnp.asarray(state), jnp.asarray(block))
        )
        got = np.asarray(
            pk.sponge_absorb(jnp.asarray(state), jnp.asarray(block),
                             tile=512, interpret=True)
        )
        assert (want == got).all()

    def test_mul16_circ_diag_mds_form(self):
        """Under a swapped circ+diag parameter set (plonky2's MDS shape,
        non-power-of-two entries) the kernel's multiply MDS form must stay
        bit-identical to the XLA path."""
        n_rounds = poseidon.FULL_ROUNDS + poseidon.PARTIAL_ROUNDS
        rc = RNG.integers(0, gl.P, size=(n_rounds, 12), dtype=np.uint64)
        try:
            poseidon.set_params(
                rc_table=rc,
                mds_row=(17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20),
                mds_diag=(8,) + (0,) * 11,
            )
            assert pk.kernel_ok()
            n = 512
            state = RNG.integers(0, gl.P, size=(n, 12), dtype=np.uint64)
            block = RNG.integers(0, gl.P, size=(n, 16), dtype=np.uint64)
            want = np.asarray(
                poseidon._sponge_absorb_xla(jnp.asarray(state), jnp.asarray(block))
            )
            got = np.asarray(
                pk.sponge_absorb(jnp.asarray(state), jnp.asarray(block),
                                 tile=512, interpret=True)
            )
            assert (want == got).all()
        finally:
            poseidon.set_params(
                seed=poseidon._DEFAULT_SEED,
                mds_row=(1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024),
                mds_diag=(0,) * 12,
            )

    def test_chained_blocks_match_hash_no_pad(self):
        """Absorbing column blocks through the kernel must reproduce the
        row digests of hash_no_pad (the Merkle leaf convention)."""
        n, cols = 512, 32
        leaf = RNG.integers(0, gl.P, size=(n, cols), dtype=np.uint64)
        want = np.asarray(poseidon.hash_no_pad(jnp.asarray(leaf)))
        state = jnp.zeros((n, 12), dtype=jnp.uint64)
        state = pk.sponge_absorb(state, jnp.asarray(leaf[:, :16]),
                                 tile=512, interpret=True)
        state = pk.sponge_absorb(state, jnp.asarray(leaf[:, 16:]),
                                 tile=512, interpret=True)
        got = np.asarray(state)[:, :4]
        assert (want == got).all()

class TestNttKernel:
    @pytest.mark.parametrize(
        "log_n,cols", [(6, 128), (9, 256), (12, 128)],
        ids=lambda v: str(v),
    )
    @pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
    def test_bit_identical_to_xla_ntt(self, log_n, cols, inverse):
        from starky_bn254_tpu import ntt
        from starky_bn254_tpu.pallas import ntt_kernel as nk

        n = 1 << log_n
        x = RNG.integers(0, gl.P, size=(n, cols), dtype=np.uint64)
        want = np.asarray(ntt._ntt_xla(jnp.asarray(x), inverse=inverse))
        got = np.asarray(nk.ntt2d(jnp.asarray(x), inverse=inverse,
                                  interpret=True))
        assert (want == got).all()

    def test_odd_log_and_special_values(self):
        """Odd log2 (unequal factors) + boundary residues exercise the
        outer-twiddle table and both kernels' carry paths."""
        from starky_bn254_tpu import ntt
        from starky_bn254_tpu.pallas import ntt_kernel as nk

        n, cols = 1 << 7, 128
        x = np.zeros((n, cols), dtype=np.uint64)
        x[: len(_SPECIAL), 0] = _SPECIAL
        x[:, 1:] = RNG.integers(0, gl.P, size=(n, cols - 1), dtype=np.uint64)
        want = np.asarray(ntt._ntt_xla(jnp.asarray(x), inverse=False))
        got = np.asarray(nk.ntt2d(jnp.asarray(x), interpret=True))
        assert (want == got).all()

    def test_multi_block_per_column_twiddle_path(self, monkeypatch):
        """Force S2 below c/128 so K2 sees several tail blocks per k1 row —
        the outer-twiddle index map must still pick the right column."""
        from starky_bn254_tpu import ntt
        from starky_bn254_tpu.pallas import ntt_kernel as nk

        monkeypatch.setenv("STARKY_NTT_SUBLANE_BUDGET", "256")
        x = RNG.integers(0, gl.P, size=(1 << 10, 512), dtype=np.uint64)
        want = np.asarray(ntt._ntt_xla(jnp.asarray(x), inverse=False))
        got = np.asarray(nk.ntt2d(jnp.asarray(x), interpret=True))
        assert (want == got).all()


class TestKeccakKernel:
    """Keccak-f[1600] sponge kernel (pallas/keccak_kernel.py) — digest
    bit-identity against the XLA scan path, incl. chunk chaining and the
    padded-tail finalize sequence the commit paths ride."""

    def test_bit_identical_to_xla_sponge(self):
        from starky_bn254_tpu import keccak
        from starky_bn254_tpu.pallas import keccak_kernel as kk

        rng = np.random.default_rng(17)
        st = jnp.asarray(rng.integers(0, 1 << 63, size=(512, 25), dtype=np.uint64))
        for chunks in (1, 3):
            blk = jnp.asarray(
                rng.integers(0, 1 << 63, size=(512, chunks * 17), dtype=np.uint64)
            )
            want = np.asarray(keccak._sponge_absorb_xla(st, blk))
            got = np.asarray(kk.sponge_absorb(st, blk, tile=512, interpret=True))
            assert (want == got).all()

    def test_chained_calls_match_hash_no_pad(self):
        from starky_bn254_tpu import keccak
        from starky_bn254_tpu.pallas import keccak_kernel as kk

        rng = np.random.default_rng(18)
        x = rng.integers(0, 1 << 63, size=(512, 55), dtype=np.uint64)
        want = keccak.hash_no_pad(x)  # numpy reference path
        n_full = 55 // 17
        xj = jnp.asarray(x)
        stream = jnp.concatenate(
            [xj[:, : n_full * 17], keccak._pad_tail(xj[:, n_full * 17 :], jnp)],
            axis=1,
        )
        state = jnp.zeros((512, 25), dtype=jnp.uint64)
        for off in range(0, stream.shape[1], 2 * 17):  # deliberately tiny calls
            state = kk.sponge_absorb(
                state, stream[:, off : off + 2 * 17], tile=512, interpret=True
            )
        assert (np.asarray(state[:, :4]) == want).all()
