"""Vectorized G2 witness generation (native-backed), Fq2 limb arithmetic.

Fq2 lift of gadgets/g1_batch.py: coordinates are pairs of [n,16] limb arrays;
an Fq2 product is four convolutions folded with u^2 = -1; inverses go through
the norm: (a + bu)^-1 = (a - bu) / (a^2 + b^2).
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..utils.conversions import N_LIMBS, int_to_limbs
from .g1_batch import _wide, conv16
from .g2 import G2_OUTPUT_COLS, zero_g2_output

P_I64 = None  # placeholder to mirror g1_batch naming


def _modw(pol, zero=False):
    return native.batch_modular_witness(pol, zero_op=zero)


def _red(x):
    """Reduce possibly-signed limb arrays [n,16] to canonical limbs."""
    return _modw(_wide(x))["outputs"]


def fq2_conv(a, b):
    """Fq2 product as wide polys: ((a0b0 - a1b1), (a0b1 + a1b0)); a, b are
    pairs of [n,16] arrays (int64-safe)."""
    return (
        conv16(a[0], b[0]) - conv16(a[1], b[1]),
        conv16(a[0], b[1]) + conv16(a[1], b[0]),
    )


def fq2_mulmod(a, b):
    w = fq2_conv(a, b)
    return (_modw(w[0])["outputs"], _modw(w[1])["outputs"])


def fq2_inv_batch(a):
    """Fq2 inverse of canonical pairs: returns canonical pair."""
    norm = conv16(a[0], a[0]) + conv16(a[1], a[1])
    norm_red = _modw(norm)["outputs"]
    inv_norm = native.batch_fq_inv(norm_red.astype(np.uint16))
    c0 = _modw(conv16(a[0], inv_norm))["outputs"]
    # -a1 * inv_norm == (p - a1) * inv_norm; use signed conv then reduce
    c1 = _modw(-conv16(a[1], inv_norm))["outputs"]
    return (c0, c1)


def _sub2(a, b):
    return (a[0].astype(np.int64) - b[0].astype(np.int64),
            a[1].astype(np.int64) - b[1].astype(np.int64))


def _pack_g2(lam, w_zero, w_x, w_y):
    parts = [lam[0], lam[1], w_x[0]["outputs"], w_x[1]["outputs"],
             w_y[0]["outputs"], w_y[1]["outputs"]]
    for wz in w_zero:
        parts += [wz["quot_abs"], wz["aux_lo"], wz["aux_hi"]]
    for w in [w_x[0], w_x[1], w_y[0], w_y[1]]:
        parts += [w["out_aux_red"], w["quot_abs"], w["aux_lo"], w["aux_hi"]]
    parts += [w_zero[0]["signs"][:, None], w_zero[1]["signs"][:, None]]
    parts += [w_x[0]["signs"][:, None], w_x[1]["signs"][:, None],
              w_y[0]["signs"][:, None], w_y[1]["signs"][:, None]]
    cells = np.concatenate(parts, axis=1)
    assert cells.shape[1] == G2_OUTPUT_COLS
    return cells


def _finish_batch(lam, x, y, zero_pol, new_x_input):
    w_zero = [_modw(zero_pol[i], zero=True) for i in range(2)]
    w_x = [_modw(new_x_input[i]) for i in range(2)]
    new_x = (w_x[0]["outputs"], w_x[1]["outputs"])
    x_m_nx = _sub2(x, new_x)
    lam_xmnx = fq2_conv(lam, x_m_nx)
    w_y = [
        _modw(lam_xmnx[0] - _wide(y[0])),
        _modw(lam_xmnx[1] - _wide(y[1])),
    ]
    new_y = (w_y[0]["outputs"], w_y[1]["outputs"])
    return _pack_g2(lam, w_zero, w_x, w_y), new_x, new_y


def double_batch_g2(x, y):
    """x, y: Fq2 pairs of [n,16] canonical limb arrays."""
    two_y = (y[0].astype(np.int64) * 2, y[1].astype(np.int64) * 2)
    two_y_red = (_red(two_y[0]), _red(two_y[1]))
    inv_2y = fq2_inv_batch(two_y_red)
    x_sq = fq2_conv(x, x)
    x_sq3_red = (_modw(x_sq[0] * 3)["outputs"], _modw(x_sq[1] * 3)["outputs"])
    lam = fq2_mulmod(x_sq3_red, inv_2y)

    lam_y = fq2_conv(lam, y)
    zero_pol = (lam_y[0] * 2 - x_sq[0] * 3, lam_y[1] * 2 - x_sq[1] * 3)
    lam_sq = fq2_conv(lam, lam)
    new_x_input = (
        lam_sq[0] - _wide(x[0].astype(np.int64) * 2),
        lam_sq[1] - _wide(x[1].astype(np.int64) * 2),
    )
    return _finish_batch(lam, x, y, zero_pol, new_x_input)


_G2_DUMMY = None


def _g2_dummy():
    global _G2_DUMMY
    if _G2_DUMMY is None:
        from .. import bn254

        g = bn254.G2_GEN
        g2 = bn254.g2_double(g)

        def to_limbs(pt):
            return (
                (
                    np.array(int_to_limbs(pt[0][0]), dtype=np.uint64),
                    np.array(int_to_limbs(pt[0][1]), dtype=np.uint64),
                ),
                (
                    np.array(int_to_limbs(pt[1][0]), dtype=np.uint64),
                    np.array(int_to_limbs(pt[1][1]), dtype=np.uint64),
                ),
            )

        _G2_DUMMY = (to_limbs(g), to_limbs(g2))
    return _G2_DUMMY


def add_batch_g2(ax, ay, bx, by, mask):
    n = ax[0].shape[0]
    (gax, gay), (gbx, gby) = _g2_dummy()
    m = mask[:, None]
    orig_bx = (bx[0], bx[1])
    orig_by = (by[0], by[1])
    ax = (np.where(m, ax[0], gax[0]), np.where(m, ax[1], gax[1]))
    ay = (np.where(m, ay[0], gay[0]), np.where(m, ay[1], gay[1]))
    bx = (np.where(m, bx[0], gbx[0]), np.where(m, bx[1], gbx[1]))
    by = (np.where(m, by[0], gby[0]), np.where(m, by[1], gby[1]))

    dx = _sub2(bx, ax)
    dy = _sub2(by, ay)
    dx_red = (_red(dx[0]), _red(dx[1]))
    inv_dx = fq2_inv_batch(dx_red)
    dy_red = (_red(dy[0]), _red(dy[1]))
    lam = fq2_mulmod(dy_red, inv_dx)

    lam_dx = fq2_conv(lam, dx)
    zero_pol = (lam_dx[0] - _wide(dy[0]), lam_dx[1] - _wide(dy[1]))
    lam_sq = fq2_conv(lam, lam)
    x_sum = (
        ax[0].astype(np.int64) + bx[0].astype(np.int64),
        ax[1].astype(np.int64) + bx[1].astype(np.int64),
    )
    new_x_input = (lam_sq[0] - _wide(x_sum[0]), lam_sq[1] - _wide(x_sum[1]))
    cells, new_x, new_y = _finish_batch(lam, ax, ay, zero_pol, new_x_input)

    cells = np.where(m, cells, zero_cells_g2(n))
    out_bx = (np.where(m, new_x[0], orig_bx[0]), np.where(m, new_x[1], orig_bx[1]))
    out_by = (np.where(m, new_y[0], orig_by[0]), np.where(m, new_y[1], orig_by[1]))
    return cells, out_bx, out_by


_ZERO_G2 = None


def zero_cells_g2(n: int) -> np.ndarray:
    global _ZERO_G2
    if _ZERO_G2 is None:
        _ZERO_G2 = np.array(zero_g2_output()["cells"], dtype=np.uint64)
    return np.broadcast_to(_ZERO_G2, (n, _ZERO_G2.shape[0]))
