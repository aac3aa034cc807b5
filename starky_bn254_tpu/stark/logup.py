"""logUp: log-derivative lookup argument (Habock-style running sums).

Proves every cell of the checked columns appears in a table column:

    sum_{rows, checked j} 1/(gamma + c_j)  ==  sum_rows m/(gamma + T)

with a committed multiplicity column m (part of the main trace) and, per
challenge gamma, auxiliary columns committed in the same phase as the
permutation Z columns:

    g       = m/(gamma + T)                       [1 col]
    h_b     = 1/(gamma+c_{2b}) + 1/(gamma+c_{2b+1})   [ceil(k/2) cols]
    S       = running sum of (sum_b h_b - g), S[0] = 0    [1 col]

Constraints (degree <= 3, all cyclic every-row):
    g*(gamma+T) - m == 0
    h_b*(gamma+c1)*(gamma+c2) - (2*gamma + c1 + c2) == 0   (pair batch)
    h_b*(gamma+c) - 1 == 0                                  (single tail)
    S(gx) - S(x) - (sum_b h_b(x) - g(x)) == 0

The cyclic S-recurrence telescopes to sum(delta) == 0, which is the logUp
identity. Compared with the reference's permuted-column lookups
(src/utils/lookup.rs + 2 permutation Z per pair), this costs ~(k/2 + 2)
aux columns instead of ~4k — the difference between fitting and not fitting
the Fq12-width traces in HBM.
"""

from __future__ import annotations

import jax
import os
from .. import xnp as jnp
import numpy as np

from .. import goldilocks as gl
from .consumer import ConstraintConsumer
from .field_expr import RowView, Val

Table = tuple  # (table_col, mult_col, tuple(checked_cols))


def batches(checked: tuple[int, ...]) -> list[tuple[int, ...]]:
    return [tuple(checked[i : i + 2]) for i in range(0, len(checked), 2)]


def table_aux_width(tables) -> int:
    """Aux columns per challenge."""
    return sum(2 + len(batches(t[2])) for t in tables)


# Deliberately SEVERAL small jit dispatches, each a strictly 2-D graph
# with the challenge as a traced scalar: XLA compiles the ~90-deep Fermat
# chain pathologically when it shares a graph with a Hillis-Steele prefix
# scan (60-80s vs ~4s split at [1024, 1100]) or runs on a 3-D broadcast
# over a challenge axis (28s vs 5s). g/h are committed columns so the
# split materializes nothing extra; per-challenge calls share one
# compiled executable. See the twin note in stark/prover.py.


@jax.jit
def _inv_shifted(vals, gamma):
    """1/(vals + gamma) elementwise, scalar gamma (pure-elementwise graph)."""
    return gl.batch_inv(gl.add(vals, gamma))


@jax.jit
def _pair_sum(inv_c):
    """1/(g+c_{2b}) + 1/(g+c_{2b+1}) for consecutive pairs: [n, k] -> [n, k/2]."""
    if inv_c.shape[1] % 2 == 1:
        inv_c = jnp.pad(inv_c, ((0, 0), (0, 1)))
    return gl.add(inv_c[:, 0::2], inv_c[:, 1::2])


@jax.jit
def _logup_gdelta(m_vals, inv_t, h_mat):
    """g = m/(gamma+T) and the per-row delta sum(h) - g (shallow graph)."""
    g = gl.mul(m_vals, inv_t)
    delta = gl.sub(gl.sum_mod(h_mat, axis=1), g)
    return g, delta


@jax.jit
def _logup_scan_2d(deltas):
    """Row-shifted cumsum of [n, D] deltas (scan-only graph)."""
    csum = gl.cumsum(deltas)
    return jnp.concatenate(
        [jnp.zeros((1, deltas.shape[1]), jnp.uint64), csum[:-1]], axis=0
    )


def compute_logup_columns(trace: jnp.ndarray, tables, gammas: list[int]) -> jnp.ndarray:
    """[n, nc * table_aux_width] aux columns, challenge-major then
    per-table [g | h... | S]."""
    # checked columns are inverted in even-sized chunks so the transient
    # 1/(gamma+c) block stays ~1 GB at the 2^20-row G1 target instead of
    # the full [n, k] (chunking at even offsets preserves the h pairing)
    chunk = 128
    parts, deltas = [], []
    for g_int in gammas:
        gamma = jnp.uint64(g_int % gl.P)
        # every lookup in this framework is a u16 range check (air.py
        # lookup_tables contract; cells are validated < 2^16 at tracegen),
        # so the denominators gamma+c take at most 2^16 distinct values:
        # ONE [2^16] Fermat-inversion program builds the whole inverse
        # table and each checked cell becomes a gather — replacing ~85
        # mod-ops per cell with one table load. Entries are the same
        # gl.batch_inv(gl.add(v, gamma)) canonical residues the
        # elementwise path produces, so aux columns (and proofs) are
        # byte-identical (tests/test_logup.py pins it).
        # TPU gathers run at ~0.6 GB/s (measured: the gather build took
        # 808 ms where the per-cell Fermat chains took 278 ms at the
        # num_io=128 G1 shape — queue_bench.log round 4), so the table
        # path is host/CPU-only; the TPU keeps the fully-vectorized
        # Fermat chains.
        on_tpu = (
            not isinstance(trace, np.ndarray)
            and jax.devices()[0].platform == "tpu"
        )
        use_gather = (
            not on_tpu
            and trace.shape[0] * sum(len(t[2]) for t in tables) >= (1 << 18)
            and not os.environ.get("STARKY_NO_LOGUP_GATHER")
        )
        inv_table = (
            _inv_shifted(jnp.arange(1 << 16, dtype=jnp.uint64), gamma)
            if use_gather
            else None
        )
        for (t_col, m_col, checked) in tables:
            if use_gather:
                inv_t = inv_table[trace[:, t_col]]
            else:
                inv_t = _inv_shifted(trace[:, t_col], gamma)
            h_chunks = []
            big = trace.size > (1 << 27) and not use_gather
            for off in range(0, len(checked), chunk):
                sub = np.array(checked[off : off + chunk], dtype=np.int32)
                if use_gather:
                    inv_c = inv_table[trace[:, jnp.asarray(sub)]]
                else:
                    inv_c = _inv_shifted(trace[:, jnp.asarray(sub)], gamma)
                h_chunks.append(_pair_sum(inv_c))
                del inv_c
                if big:
                    # bound concurrent program temp reservations (the deep
                    # Fermat-chain graphs are queued per chunk otherwise;
                    # hard_sync because block_until_ready does not actually
                    # wait over the tunneled TPU — the queued inversion
                    # programs' temps coexisted and OOM'd the 2^19 runs)
                    from ..xnp import hard_sync

                    hard_sync(h_chunks[-1])
            h_mat = h_chunks[0] if len(h_chunks) == 1 else jnp.concatenate(
                h_chunks, axis=1
            )
            del h_chunks
            g, delta = _logup_gdelta(trace[:, m_col], inv_t, h_mat)
            parts.append((g, h_mat))
            deltas.append(delta)
    s_all = _logup_scan_2d(jnp.stack(deltas, axis=1))
    cols = []
    for i, (g, h_mat) in enumerate(parts):
        cols.append(jnp.concatenate([g[:, None], h_mat, s_all[:, i : i + 1]], axis=1))
    return jnp.concatenate(cols, axis=1)


def compute_logup_columns_streamed(
    trace, tables, gammas: list[int], block: int = 1 << 18
) -> np.ndarray:
    """North-star-scale twin of compute_logup_columns: the device computes
    each ROW BLOCK's g/h columns (chunked Fermat chains, synced per block)
    and the per-row deltas; results stream to a preallocated HOST buffer
    and the S running
    sum finishes as a host cumsum. Device residency is bounded by one
    block's temporaries — at 2^20 rows the all-device build held the
    [n, ~390] aux block (3.2 GB) next to the subgroup trace (3.4 GB) and
    OOM'd (queue_northstar20.log, round 4). Byte-identical to the
    all-device path (tests/test_logup.py pins it); the returned numpy array
    feeds the commit-from-host offload path directly."""
    from ..xnp import hard_sync

    n = trace.shape[0]
    nc = len(gammas)
    w = table_aux_width(tables)
    out = np.zeros((n, nc * w), dtype=np.uint64)
    deltas = np.zeros((n, 0), dtype=np.uint64)
    col = 0
    for g_int in gammas:
        gamma = jnp.uint64(g_int % gl.P)
        for (t_col, m_col, checked) in tables:
            nb = len(batches(checked))
            g_col, h0, s_col = col, col + 1, col + 1 + nb
            delta_t = np.zeros((n,), dtype=np.uint64)
            for r0 in range(0, n, block):
                blk = trace[r0 : r0 + block]
                inv_t = _inv_shifted(blk[:, t_col], gamma)
                h_chunks = []
                for off in range(0, len(checked), 128):
                    sub = np.array(checked[off : off + 128], dtype=np.int32)
                    inv_c = _inv_shifted(blk[:, jnp.asarray(sub)], gamma)
                    h_chunks.append(_pair_sum(inv_c))
                    del inv_c
                h_mat = (
                    h_chunks[0]
                    if len(h_chunks) == 1
                    else jnp.concatenate(h_chunks, axis=1)
                )
                del h_chunks
                g, delta = _logup_gdelta(blk[:, m_col], inv_t, h_mat)
                out[r0 : r0 + block, g_col] = np.asarray(g)
                out[r0 : r0 + block, h0 : h0 + nb] = np.asarray(h_mat)
                delta_t[r0 : r0 + block] = np.asarray(delta)
                hard_sync(g)  # bound coexisting block temps on the chip
                del h_mat, g, delta
                from ..utils.memhygiene import trim

                trim()  # see prover._commit_streaming: host-OOM hygiene
            deltas = np.concatenate([deltas, delta_t[:, None]], axis=1)
            # S filled below once every table's deltas exist (cumsum order
            # must match _logup_scan_2d: one shifted scan per delta column)
            out[1:, s_col] = 0  # placeholder; overwritten after the loop
            col += 2 + nb
    # host shifted cumsum, same element order as the device scan
    csum = np.asarray(gl.cumsum(deltas))  # numpy in -> numpy out (xnp)
    col = 0
    di = 0
    for _ in gammas:
        for (t_col, m_col, checked) in tables:
            nb = len(batches(checked))
            s_col = col + 1 + nb
            out[0, s_col] = 0
            out[1:, s_col] = csum[:-1, di]
            di += 1
            col += 2 + nb
    return out


def logup_constraints(
    tables,
    gammas: list[Val],
    lv: RowView,
    nv: RowView,
    aux_lv: RowView,
    aux_nv: RowView,
    cc: ConstraintConsumer,
    aux_offset: int,
):
    """Framework constraints; aux_offset = column where logup aux starts in
    the aux commitment (after permutation Z columns)."""
    w = table_aux_width(tables)
    for ci, gamma in enumerate(gammas):
        base = aux_offset + ci * w
        for (t_col, m_col, checked) in tables:
            bs = batches(checked)
            g_col = base
            h0 = base + 1
            s_col = base + 1 + len(bs)
            base += 2 + len(bs)

            g = aux_lv.col(g_col)
            t = lv.col(t_col)
            m = lv.col(m_col)
            cc.constraint(g * (t + gamma) - m)

            pair_i = [i for i, b in enumerate(bs) if len(b) == 2]
            if pair_i:
                h = aux_lv.cols_idx([h0 + i for i in pair_i])
                c1 = lv.cols_idx([bs[i][0] for i in pair_i])
                c2 = lv.cols_idx([bs[i][1] for i in pair_i])
                cc.constraint(
                    h * (c1 + gamma.lane()) * (c2 + gamma.lane())
                    - (c1 + c2 + gamma.lane() * 2)
                )
            single_i = [i for i, b in enumerate(bs) if len(b) == 1]
            if single_i:
                h = aux_lv.cols_idx([h0 + i for i in single_i])
                c1 = lv.cols_idx([bs[i][0] for i in single_i])
                cc.constraint(h * (c1 + gamma.lane()) - 1)

            all_h = aux_lv.cols(h0, h0 + len(bs))
            axis = -2 if all_h.ext else -1
            h_sum = Val(gl.sum_mod(all_h.arr, axis=axis), all_h.ext)
            s = aux_lv.col(s_col)
            s_next = aux_nv.col(s_col)
            cc.constraint(s_next - s - (h_sum - g))
