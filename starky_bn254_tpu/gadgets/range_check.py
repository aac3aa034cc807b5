"""Lookup-based u16 range checks, both reference flavors.

(a) `u16`: one ascending 0..2^16 table column + (col_perm, table_perm) per
    checked column — needs trace height >= 2^16 (reference
    src/utils/range_check.rs:20-47; adds 1 + 2k columns).
(b) `split_u16`: 8-bit table; each checked u16 column is split into lo/hi
    bytes — works at any power-of-two height >= 256 (range_check.rs:116-160;
    adds 1 + 6k columns: per col [lo, lo_perm, table_perm, hi, hi_perm,
    table_perm]).

Generation is vectorized numpy over all checked columns; evaluation is
lane-stacked.
"""

from __future__ import annotations

import numpy as np

from ..stark.consumer import ConstraintConsumer
from ..stark.field_expr import RowView
from ..utils.conversions import LIMB_BITS
from .lookup import eval_lookups, permuted_cols


def _table(num_rows: int, range_max: int) -> np.ndarray:
    t = np.full(num_rows, range_max - 1, dtype=np.uint64)
    t[:range_max] = np.arange(range_max, dtype=np.uint64)
    return t


# ---------------------------------------------------------------------------
# flavor (a): full u16 table
# ---------------------------------------------------------------------------


def generate_u16_range_check(
    trace_cols: np.ndarray, target_cols: list[int]
) -> np.ndarray:
    """trace_cols: [n, C]; returns the appended columns [n, 1 + 2k]."""
    n = trace_cols.shape[0]
    range_max = 1 << LIMB_BITS
    assert n >= range_max, "u16 range check needs >= 2^16 rows"
    table = _table(n, range_max)
    out = [table]
    for c in target_cols:
        col = trace_cols[:, c]
        assert (col < range_max).all(), f"column {c} has out-of-range values"
        col_perm, table_perm = permuted_cols(col, table)
        out += [col_perm, table_perm]
    return np.stack(out, axis=1)


def eval_u16_range_check(
    cc: ConstraintConsumer,
    lv: RowView,
    nv: RowView,
    start_col: int,
    num_targets: int,
):
    perm_in = [start_col + 1 + 2 * i for i in range(num_targets)]
    perm_tb = [start_col + 1 + 2 * i + 1 for i in range(num_targets)]
    eval_lookups(cc, lv, nv, perm_in, perm_tb)
    _eval_table_shape(cc, lv, nv, start_col, (1 << LIMB_BITS) - 1)


def u16_range_check_pairs(
    start_col: int, target_cols: list[int]
) -> list[tuple[int, int]]:
    pairs = []
    for i, pos in enumerate(target_cols):
        pairs.append((start_col, start_col + 1 + 2 * i + 1))  # table ~ table_perm
        pairs.append((pos, start_col + 1 + 2 * i))  # col ~ col_perm
    return pairs


# ---------------------------------------------------------------------------
# flavor (b): split 8-bit table
# ---------------------------------------------------------------------------


def generate_split_u16_range_check(
    trace_cols: np.ndarray, target_cols: list[int]
) -> np.ndarray:
    """Returns appended columns [n, 1 + 6k]."""
    n = trace_cols.shape[0]
    range_max = 1 << 8
    assert n >= range_max and n & (n - 1) == 0
    table = _table(n, range_max)
    out = [table]
    for c in target_cols:
        col = trace_cols[:, c]
        assert (col < (1 << 16)).all()
        lo = col & 0xFF
        hi = col >> 8
        lo_perm, lo_table_perm = permuted_cols(lo, table)
        hi_perm, hi_table_perm = permuted_cols(hi, table)
        out += [lo, lo_perm, lo_table_perm, hi, hi_perm, hi_table_perm]
    return np.stack(out, axis=1)


def eval_split_u16_range_check(
    cc: ConstraintConsumer,
    lv: RowView,
    nv: RowView,
    start_col: int,
    target_cols: list[int],
):
    k = len(target_cols)
    lo_cols = [start_col + 1 + 6 * i for i in range(k)]
    hi_cols = [start_col + 4 + 6 * i for i in range(k)]
    # recomposition: col == lo + 2^8 * hi
    orig = lv.cols_idx(target_cols)
    lo = lv.cols_idx(lo_cols)
    hi = lv.cols_idx(hi_cols)
    cc.constraint(orig - (lo + hi * (1 << 8)))
    eval_lookups(
        cc,
        lv,
        nv,
        [c + 1 for c in lo_cols] + [c + 1 for c in hi_cols],
        [c + 2 for c in lo_cols] + [c + 2 for c in hi_cols],
    )
    _eval_table_shape(cc, lv, nv, start_col, (1 << 8) - 1)


def split_u16_range_check_pairs(
    start_col: int, num_targets: int
) -> list[tuple[int, int]]:
    pairs = []
    for i in range(num_targets):
        base = start_col + 1 + 6 * i
        pairs.append((start_col, base + 2))  # table ~ lo table_perm
        pairs.append((start_col, base + 5))  # table ~ hi table_perm
        pairs.append((base, base + 1))  # lo ~ lo_perm
        pairs.append((base + 3, base + 4))  # hi ~ hi_perm
    return pairs


# ---------------------------------------------------------------------------
# flavor (c): logUp with an 8-bit table (works at any height >= 256)
# ---------------------------------------------------------------------------


def generate_logup_range_check(
    trace_cols: np.ndarray, target_cols: list[int]
) -> np.ndarray:
    """Returns appended columns [n, 2 + 2k]: [table, mult, lo_0, hi_0, ...].

    The aux (h/g/S) columns are challenge-dependent and are built by the
    framework (stark/logup.py) in the second commitment phase.
    """
    n = trace_cols.shape[0]
    range_max = 1 << 8
    assert n & (n - 1) == 0
    assert n >= range_max, (
        f"8-bit lookup table needs >= 256 rows (got {n}); use a larger batch"
    )
    table = _table(n, range_max)
    split_cols = []
    counts = np.zeros(range_max, dtype=np.int64)
    for c in target_cols:
        col = trace_cols[:, c]
        assert (col < (1 << 16)).all()
        lo = col & 0xFF
        hi = col >> 8
        counts += np.bincount(lo.astype(np.int64), minlength=range_max)
        counts += np.bincount(hi.astype(np.int64), minlength=range_max)
        split_cols += [lo, hi]
    # multiplicity: padding rows repeat the value 255; attribute its whole
    # count to the canonical row 255 and zero elsewhere
    mult = np.zeros(n, dtype=np.uint64)
    mult[:range_max] = counts.astype(np.uint64)
    return np.stack([table, mult] + split_cols, axis=1)


def eval_logup_range_check(
    cc: ConstraintConsumer,
    lv: RowView,
    nv: RowView,
    start_col: int,
    target_cols: list[int],
):
    """Trace-side constraints only: byte recomposition + table shape. The
    logUp sum constraints are emitted by the framework from lookup_tables()."""
    k = len(target_cols)
    lo_cols = [start_col + 2 + 2 * i for i in range(k)]
    hi_cols = [start_col + 3 + 2 * i for i in range(k)]
    orig = lv.cols_idx(target_cols)
    lo = lv.cols_idx(lo_cols)
    hi = lv.cols_idx(hi_cols)
    cc.constraint(orig - (lo + hi * (1 << 8)))
    _eval_table_shape(cc, lv, nv, start_col, (1 << 8) - 1)


def logup_range_check_tables(start_col: int, num_targets: int):
    checked = []
    for i in range(num_targets):
        checked += [start_col + 2 + 2 * i, start_col + 3 + 2 * i]
    return [(start_col, start_col + 1, tuple(checked))]


def generate_logup_u16_range_check(
    trace_cols: np.ndarray, target_cols: list[int]
) -> np.ndarray:
    """Full 2^16 table + multiplicity, no byte splits (needs n >= 2^16):
    appended columns [n, 2]."""
    n = trace_cols.shape[0]
    range_max = 1 << 16
    assert n >= range_max and n & (n - 1) == 0
    table = _table(n, range_max)
    counts = None
    if trace_cols.dtype == np.uint64 and trace_cols.strides[1] == 8:
        from .. import native

        # strided single-pass C++ histogram (also validates < 2^16); the
        # numpy route below copies the ~380 checked columns three times
        # (fancy-index + astype + ravel — measured 1.9 s of a 2.2 s G1
        # tracegen at num_io=128)
        counts = native.hist_u16_cols(trace_cols, np.asarray(target_cols))
    if counts is None:
        cols = trace_cols[:, target_cols]
        assert (cols < range_max).all()
        counts = np.bincount(
            cols.astype(np.int64, copy=False).ravel(), minlength=range_max
        )
    mult = np.zeros(n, dtype=np.uint64)
    mult[:range_max] = counts.astype(np.uint64)
    return np.stack([table, mult], axis=1)


class RangeCheckSpec:
    """Uniform interface over the range-check flavors.

    flavor: "u16" (full 2^16 table + permutation argument, needs n >= 2^16),
            "split" (8-bit table + permutation argument),
            "logup" (8-bit table + log-derivative argument),
            "logup_u16" (2^16 table + log-derivative — cheapest, n >= 2^16).
    """

    def __init__(self, flavor: str, start_col: int, target_cols: list[int]):
        assert flavor in ("u16", "split", "logup", "logup_u16")
        self.flavor = flavor
        self.start_col = start_col
        self.targets = list(target_cols)
        k = len(self.targets)
        self.num_added = {
            "u16": 1 + 2 * k,
            "split": 1 + 6 * k,
            "logup": 2 + 2 * k,
            "logup_u16": 2,
        }[flavor]

    def generate(self, base: np.ndarray) -> np.ndarray:
        if self.flavor == "u16":
            return generate_u16_range_check(base, self.targets)
        if self.flavor == "split":
            return generate_split_u16_range_check(base, self.targets)
        if self.flavor == "logup_u16":
            return generate_logup_u16_range_check(base, self.targets)
        return generate_logup_range_check(base, self.targets)

    def eval(self, cc, lv, nv):
        if self.flavor == "u16":
            eval_u16_range_check(cc, lv, nv, self.start_col, len(self.targets))
        elif self.flavor == "split":
            eval_split_u16_range_check(cc, lv, nv, self.start_col, self.targets)
        elif self.flavor == "logup_u16":
            _eval_table_shape(cc, lv, nv, self.start_col, (1 << 16) - 1)
        else:
            eval_logup_range_check(cc, lv, nv, self.start_col, self.targets)

    def pairs(self) -> list[tuple[int, int]]:
        if self.flavor == "u16":
            return u16_range_check_pairs(self.start_col, self.targets)
        if self.flavor == "split":
            return split_u16_range_check_pairs(self.start_col, len(self.targets))
        return []

    def tables(self):
        if self.flavor == "logup":
            return logup_range_check_tables(self.start_col, len(self.targets))
        if self.flavor == "logup_u16":
            return [(self.start_col, self.start_col + 1, tuple(self.targets))]
        return []


def _eval_table_shape(cc, lv, nv, table_col: int, range_max_m1: int):
    cur = lv.col(table_col)
    nxt = nv.col(table_col)
    cc.constraint_first_row(cur)
    incr = nxt - cur
    cc.constraint_transition(incr * incr - incr)
    cc.constraint_last_row(cur - range_max_m1)
