"""Vectorized Fq12 multiplication witness (native-backed).

Batched version of gadgets/fq12.py: values are [n, 12, 16] limb arrays; the
6x6 Fq2 schoolbook runs as one broadcasted convolution [n,12,12,31] and the
xi-fold recombination in numpy; 12 native modular witnesses finish each
product.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..utils.conversions import N_LIMBS
from .fq12 import FQ12_OUTPUT_COLS, XI
from .g1_batch import conv16

WIDE = 2 * N_LIMBS - 1


def fq12_wide_products(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    """a, b: [n, 12, 16]. Returns 12 wide polys [n, 31] int64 (xi-folded),
    exactly the pol_mul_fq12 recombination (gadgets/fq12.py)."""
    ab = conv16(a[:, :, None, :], b[:, None, :, :])  # [n, 12, 12, 31]
    n = a.shape[0]
    re = np.zeros((11, n, WIDE), dtype=np.int64)
    im = np.zeros((11, n, WIDE), dtype=np.int64)
    for i in range(6):
        for j in range(6):
            k = i + j
            re[k] += ab[:, i, j] - ab[:, i + 6, j + 6]
            im[k] += ab[:, i, j + 6] + ab[:, i + 6, j]
    out = []
    for i in range(6):
        if i < 5:
            out.append(re[i] + XI * re[i + 6] - im[i + 6])
        else:
            out.append(re[i])
    for i in range(6):
        if i < 5:
            out.append(im[i] + re[i + 6] + XI * im[i + 6])
        else:
            out.append(im[i])
    return out


def fq12_mul_cells_batch(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None):
    """Returns (cells [n, 84*N_LIMBS], product [n, 12, 16])."""
    n = a.shape[0]
    wides = fq12_wide_products(a, b)
    ws = [native.batch_modular_witness(w, zero_op=False) for w in wides]
    parts = [w["outputs"] for w in ws]
    for w in ws:
        parts += [w["out_aux_red"], w["quot_abs"], w["aux_lo"], w["aux_hi"]]
    parts.append(np.stack([w["signs"] for w in ws], axis=1))
    cells = np.concatenate(parts, axis=1)
    assert cells.shape[1] == FQ12_OUTPUT_COLS
    product = np.stack([w["outputs"] for w in ws], axis=1)  # [n, 12, 16]
    if mask is not None:
        from .fq12 import zero_fq12_output

        zero = np.array(zero_fq12_output()["cells"], dtype=np.uint64)
        cells = np.where(mask[:, None], cells, zero)
    return cells, product
