"""Fq12 multiplication gadget: 12 modular ops per product.

Re-derivation of reference src/fields/fq12/mul.rs: an Fq12 value is 12 limb
vectors [re0..re5, im0..im5] (6 Fq2 coefficients of a degree-6 polynomial in
w, with w^6 = XI = 9 + u). Schoolbook 6x6 over Fq2 pairs gives 11 wide
Fq2 coefficients; the fold-down multiplies the top 5 by XI:

  out_re[i] = re[i] + 9*re[i+6] - im[i+6]        (i < 5)
  out_im[i] = im[i] + re[i+6] + 9*im[i+6]        (i < 5)
  out_re[5] = re[5],  out_im[5] = im[5]

where re[k] = (a0b0 - a1b1)[k], im[k] = (a0b1 + a1b0)[k]
(mul.rs:24-87, xi = 9 at :196).

Output block (84*N_LIMBS cells, mul.rs:176-215): output(12x16) then 12x
aux(95) then 12 quotient signs.
"""

from __future__ import annotations

from .. import bn254
from ..stark.consumer import ConstraintConsumer
from ..stark.field_expr import Val
from ..utils.conversions import N_LIMBS, int_to_limbs
from . import modular as mod
from .limbs import pol_mul_wide

FQ12_OUTPUT_COLS = 84 * N_LIMBS  # 1344
P = bn254.P_BN
XI = 9


# ----------------------------------------------------------------------------
# shared schoolbook + fold (generic over int-lists and Vals)
# ----------------------------------------------------------------------------


def _pol_mul_fq12_generic(a, b, mul, add, sub, scalar):
    """a, b: lists of 12 limb 'vectors'; returns 12 wide vectors."""
    re = [None] * 11  # a0b0 - a1b1 accumulated per degree
    im = [None] * 11  # a0b1 + a1b0
    a0b0 = [None] * 11
    a0b1 = [None] * 11
    a1b0 = [None] * 11
    a1b1 = [None] * 11
    for i in range(6):
        for j in range(6):
            k = i + j
            c00 = mul(a[i], b[j])
            c01 = mul(a[i], b[j + 6])
            c10 = mul(a[i + 6], b[j])
            c11 = mul(a[i + 6], b[j + 6])
            a0b0[k] = c00 if a0b0[k] is None else add(a0b0[k], c00)
            a0b1[k] = c01 if a0b1[k] is None else add(a0b1[k], c01)
            a1b0[k] = c10 if a1b0[k] is None else add(a1b0[k], c10)
            a1b1[k] = c11 if a1b1[k] is None else add(a1b1[k], c11)
    for k in range(11):
        re[k] = sub(a0b0[k], a1b1[k])
        im[k] = add(a0b1[k], a1b0[k])
    out = []
    for i in range(6):
        if i < 5:
            out.append(sub(add(re[i], scalar(re[i + 6], XI)), im[i + 6]))
        else:
            out.append(re[i])
    for i in range(6):
        if i < 5:
            out.append(add(add(im[i], re[i + 6]), scalar(im[i + 6], XI)))
        else:
            out.append(im[i])
    return out


# int-list ops
def _imul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] += ai * bj
    return out


def _iadd(a, b):
    n = max(len(a), len(b))
    return [(a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0) for i in range(n)]


def _isub(a, b):
    n = max(len(a), len(b))
    return [(a[i] if i < len(a) else 0) - (b[i] if i < len(b) else 0) for i in range(n)]


def _iscalar(a, c):
    return [c * v for v in a]


def generate_fq12_mul(a: "bn254.Fq12", b: "bn254.Fq12") -> dict:
    """Host witness: returns cells (84*N_LIMBS) + the product as Fq12."""
    al = [int_to_limbs(v) for v in a.to_fq_list()]
    bl = [int_to_limbs(v) for v in b.to_fq_list()]
    wides = _pol_mul_fq12_generic(al, bl, _imul, _iadd, _isub, _iscalar)
    ws = [mod.generate_modular_op(P, w) for w in wides]
    cells = []
    for w in ws:
        cells += w["output"]
    for w in ws:
        cells += w["out_aux_red"] + w["quot_abs"] + w["aux_lo"] + w["aux_hi"]
    cells += [w["quot_sign"] for w in ws]
    assert len(cells) == FQ12_OUTPUT_COLS
    product = bn254.Fq12.from_fq_list([w["output_int"] for w in ws])
    # sanity: matches the tower-arithmetic oracle
    assert product.to_fq_list() == (a * b).to_fq_list()
    return {"cells": cells, "product": product}


def zero_fq12_output() -> dict:
    z = mod.zero_modular_aux()
    cells = [0] * (12 * N_LIMBS)
    for _ in range(12):
        cells += z["out_aux_red"] + z["quot_abs"] + z["aux_lo"] + z["aux_hi"]
    cells += [1] * 12
    assert len(cells) == FQ12_OUTPUT_COLS
    return {"cells": cells, "product": bn254.Fq12.zero()}


class Fq12OutputView:
    def __init__(self, lv, base: int):
        c = base
        self.output = []
        for _ in range(12):
            self.output.append(lv.cols(c, c + N_LIMBS))
            c += N_LIMBS
        self.aux = []
        for _ in range(12):
            red = lv.cols(c, c + N_LIMBS); c += N_LIMBS
            qa = lv.cols(c, c + N_LIMBS + 1); c += N_LIMBS + 1
            lo = lv.cols(c, c + 2 * N_LIMBS - 1); c += 2 * N_LIMBS - 1
            hi = lv.cols(c, c + 2 * N_LIMBS - 1); c += 2 * N_LIMBS - 1
            self.aux.append((red, qa, lo, hi))
        self.signs = [lv.col(c + i) for i in range(12)]
        c += 12
        assert c == base + FQ12_OUTPUT_COLS
        self.end = c


def eval_fq12_mul(
    cc: ConstraintConsumer,
    filter_v: Val,
    a: list[Val],  # 12 x [.., 16]
    b: list[Val],
    o: Fq12OutputView,
):
    wides = _pol_mul_fq12_generic(
        a,
        b,
        mul=pol_mul_wide,
        add=lambda x, y: x + y,
        sub=lambda x, y: x - y,
        scalar=lambda x, c: x * c,
    )
    for k in range(12):
        red, qa, lo, hi = o.aux[k]
        mod.eval_modular_op(
            cc, filter_v, P, wides[k], o.output[k], o.signs[k], red, qa, lo, hi
        )
