"""STARK prover: trace commit -> permutation Z -> quotient -> FRI.

Replaces `starky::prover::prove` (called by the reference at e.g.
src/fields/fq/exp.rs:618-625) with an array-first pipeline:

  trace [n, C] --INTT--> coeffs --coset NTT--> LDE [N, C] --Merkle--> cap
      |                                            |
      +-- permutation Z columns (scan-built grand products) --> Z cap
      +-- composition: AIR.eval vectorized over all N LDE rows at once
      +-- quotient chunks --> cap --> openings at zeta, g*zeta --> FRI

Every hot stage (NTT, Merkle hashing, composition, FRI folds) is a batched
device computation; the host only sequences Fiat-Shamir.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import goldilocks as gl
from .. import merkle, ntt
from ..challenger import Challenger
from .air import Air
from .config import StarkConfig
from .consumer import ConstraintConsumer
from .field_expr import PublicInputsView, RowView, Val
from .fri import fri_prove
from .proof import StarkOpenings, StarkProof

QUOTIENT_CHUNKS = 2  # constraint degree 3 => quotient degree < 2n


@dataclass
class Commitment:
    lde: jnp.ndarray  # [N, C]
    tree: merkle.MerkleTree


# Above this many cells the commit pipeline synchronizes between stages:
# async dispatch otherwise enqueues the INTT, LDE and tree programs at
# once and the allocator reserves ALL their temp buffers simultaneously
# (measured: a 2^19-row x 404-col commit OOM'd a chip that holds 19 GiB
# of live data just fine).
_SYNC_CELLS = 1 << 27


from ..xnp import hard_sync  # noqa: E402  (barrier that actually waits)


def commit(
    values,
    cfg: StarkConfig,
    offload: bool | None = None,
    shift: int = gl.GENERATOR,
) -> Commitment:
    # A 1-element list transfers ownership: commit pops the array so the
    # caller's reference dies and the source can be freed before the LDE
    # concat (matters at multi-GB commitment widths).
    # `shift`: LDE coset shift — mixed-height shared-FRI batches commit a
    # statement at N_max/4^k on coset g^(4^k) so its opening polynomial
    # lives exactly on the fold ladder's layer-k domain (stark/batch_prove).
    if isinstance(values, list):
        assert len(values) == 1
        values = values.pop()
    if values.size > _SYNC_CELLS or offload:
        return _commit_streaming(values, cfg, offload, shift)
    coeffs = ntt.interpolate_coeffs(values)
    lde = ntt.lde_from_coeffs(coeffs, cfg.fri.rate_bits, shift)
    del coeffs
    n_lde = lde.shape[0]
    cap_h = min(cfg.fri.cap_height, n_lde.bit_length() - 1)
    tree = merkle.build_merkle_tree(lde, cap_h, cfg.fri.merkle_hash)
    # neither the subgroup evaluations nor the coefficients are retained:
    # at the 2^20-row G1 target each would be ~3.4 GB per commitment.
    # Openings are evaluated barycentrically from the LDE (ntt.eval_from_lde).
    return Commitment(lde, tree)


def _commit_streaming(
    values: jnp.ndarray,
    cfg: StarkConfig,
    offload: bool | None = None,
    shift: int = gl.GENERATOR,
) -> Commitment:
    """Column-blocked commit for matrices whose single-graph INTT/LDE/tree
    programs exceed HBM (the [2^19-row, 404-col] G1 commit OOM'd even though
    its retained arrays are a fraction of the chip's memory: XLA's per-
    program temp reservations are the footprint). Each block runs
    INTT -> LDE -> sponge-absorb with an explicit device sync; the carried
    sponge state makes leaf digests bit-identical to the monolithic path."""
    from ..hashing import get_hasher

    import os

    poseidon = get_hasher(cfg.fri.merkle_hash)  # hasher module (name kept
    # for the RATE/WIDTH reads below; poseidon by default, keccak when the
    # config selects the Keccak-f[1600] Merkle hash)

    n, num_cols = values.shape
    n_lde = n << cfg.fri.rate_bits
    # blocks of whole RATE-chunks so absorption chains exactly.
    # Default 2^26 cells (was 2^27): the Pallas four-step NTT keeps ~3 full
    # u32-pair copies of a block's LDE live at once, and the 2^19-row G1
    # aux commit (390 cols; trace LDE + aux LDE = 6.2 GB retained) OOM'd the
    # 16 GB chip with 128-col blocks. Halving the block halves the NTT
    # transients at the cost of ~2x more (cheap) kernel launches.
    cells = int(os.environ.get("STARKY_COMMIT_BLOCK_CELLS", 1 << 26))
    block_cols = max((cells // n_lde) // poseidon.RATE * poseidon.RATE, poseidon.RATE)
    # LDEs past this size are kept in HOST memory (the 2^20-row G1 target
    # retains trace 6.3 GB + aux 6.1 GB of LDE — together they cannot live
    # in a 16 GB chip's HBM next to the commit transients). Every
    # downstream consumer already reads the LDE in bounded blocks/chunks
    # (composition row blocks, opening matvec chunks, barycentric eval
    # chunks, 84-row query gathers), so a host-resident LDE costs one
    # re-upload of each cell it touches and zero algorithm changes.
    if offload is None:  # per-matrix rule; prove() forces True when the
        # SUM of a prove's retained LDEs exceeds the device budget (two
        # 3.3 GB LDEs each under this threshold still OOM'd a 2^19 run)
        offload = n_lde * num_cols * 8 > int(
            os.environ.get("STARKY_LDE_HOST_BYTES", 4 << 30)
        )
    state = jnp.zeros((n_lde, poseidon.WIDTH), dtype=jnp.uint64)
    # preallocate the output ONCE (before block churn fragments the
    # allocator) and write each block in place via a donated
    # dynamic_update_slice — a final concatenate needs a second full-size
    # contiguous buffer exactly when fragmentation makes one unavailable
    if offload:
        lde = np.empty((n_lde, num_cols), dtype=np.uint64)
    else:
        lde = jnp.zeros((n_lde, num_cols), dtype=jnp.uint64)
        jax.block_until_ready(lde)
    for off in range(0, num_cols, block_cols):
        blk = values[:, off : off + block_cols]
        coeffs = ntt.interpolate_coeffs(blk)
        hard_sync(coeffs)
        lde_b = ntt.lde_from_coeffs(coeffs, cfg.fri.rate_bits, shift)
        del coeffs
        hard_sync(lde_b)
        if offload:
            lde[:, off : off + lde_b.shape[1]] = np.asarray(lde_b)
        else:
            lde = _write_cols(lde, lde_b, jnp.int32(off))
        # absorb whole RATE-chunks; a sub-rate remainder can only exist in
        # the FINAL block (block_cols is a RATE multiple) and is carried to
        # the hasher's finalize below, which applies the hasher's own
        # padding discipline (zero-pad overwrite for poseidon — digests
        # bit-identical to the historical inline pad — 10*1 for keccak)
        full_w = lde_b.shape[1] // poseidon.RATE * poseidon.RATE
        tail = lde_b[:, full_w:] if full_w < lde_b.shape[1] else None
        if full_w:
            state = poseidon.sponge_absorb(state, lde_b[:, :full_w])
        del lde_b
        hard_sync(state)
        if not offload:
            hard_sync(lde)
        else:
            # each block churns a ~0.3 GB transient D2H copy; glibc keeps
            # the freed arenas resident and the 2^20 north star was
            # host-OOM-killed at 130 GB RSS (utils/memhygiene.py)
            from ..utils.memhygiene import trim

            trim()
    del values  # last reference when called via the 1-list ownership form
    digests = poseidon.finalize(state, tail)
    del state
    cap_h = min(cfg.fri.cap_height, n_lde.bit_length() - 1)
    levels = [digests] + list(
        merkle._upper_levels(digests, cap_h, cfg.fri.merkle_hash)
    )
    return Commitment(lde, merkle.MerkleTree(levels=levels, cap_height=cap_h))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_cols(buf, block, off):
    """In-place (donated) column-block write at a dynamic offset."""
    return jax.lax.dynamic_update_slice(buf, block, (jnp.int32(0), off))



# The aux-column builders are deliberately SEVERAL small jit dispatches,
# each a strictly 2-D graph with the challenge as a traced scalar. XLA's
# compile time explodes superlinearly when (a) the ~90-deep Fermat
# inversion chain and a Hillis-Steele prefix scan land in ONE graph
# (inv 3.4s + cumprod 1.0s separately vs 60-80s combined at [1024, 1100])
# or (b) the deep chain runs on a 3-D broadcast over a challenge axis
# (28.4s vs 4.7s for the same element count in 2-D). Splitting at the scan
# boundary costs nothing: the stage-1 ratios/g/h are committed columns
# regardless, and per-challenge calls share one compiled executable.


@jax.jit
def _gather_cols(trace, idx):
    return trace[:, idx]


@jax.jit
def _z_ratio_2d(a_vals, b_vals, gamma):
    """(a+gamma)/(b+gamma) elementwise on [n, nP] with scalar gamma."""
    num = gl.add(a_vals, gamma)
    den = gl.add(b_vals, gamma)
    return gl.mul(num, gl.batch_inv(den))


@jax.jit
def _z_scan_2d(ratio):
    """Prefix products of [n, nP] ratios -> row-shifted Z columns."""
    prods = gl.cumprod(ratio)  # inclusive, along rows
    return jnp.concatenate(
        [jnp.ones((1, ratio.shape[1]), dtype=jnp.uint64), prods[:-1]], axis=0
    )


def compute_z_columns(
    trace: jnp.ndarray, pairs: list[tuple[int, int]], gammas: list[int]
) -> jnp.ndarray:
    """Grand-product Z columns, challenge-major order: [n, len(gammas)*len(pairs)].

    Z[0] = 1, Z[i+1] = Z[i] * (a_i + gamma) / (b_i + gamma); multiset equality
    of columns a and b iff the product wraps to 1, enforced by the cyclic
    transition constraint in `permutation_constraints`.
    """
    a_idx = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    b_idx = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    a_vals = _gather_cols(trace, a_idx)
    b_vals = _gather_cols(trace, b_idx)
    cols = []
    for g in gammas:
        ratio = _z_ratio_2d(a_vals, b_vals, jnp.uint64(g % gl.P))
        cols.append(_z_scan_2d(ratio))
    return jnp.concatenate(cols, axis=1)


def permutation_constraints(
    pairs: list[tuple[int, int]],
    gammas: list,
    lv: RowView,
    nv: RowView,
    z_lv: RowView,
    z_nv: RowView,
    cc: ConstraintConsumer,
    ext: bool,
):
    """Framework-added constraints for the permutation argument.

    gammas: list of Val-compatible scalars (base ints for prover-side trace
    building become Val constants here; verifier passes ext-embedded Vals).
    Deterministic order: challenge-major, then pair index, first-row
    constraints then transition constraints (lane-stacked per challenge).
    """
    from .field_expr import stack_vals

    n_pairs = len(pairs)
    a_idx = [p[0] for p in pairs]
    b_idx = [p[1] for p in pairs]
    for ci, gamma in enumerate(gammas):
        zs = z_lv.cols_idx([ci * n_pairs + k for k in range(n_pairs)])
        zns = z_nv.cols_idx([ci * n_pairs + k for k in range(n_pairs)])
        avs = lv.cols_idx(a_idx)
        bvs = lv.cols_idx(b_idx)
        cc.constraint_first_row(zs - 1)
        # cyclic: Z(gx)*(b+gamma) - Z(x)*(a+gamma) == 0 on every row; at the
        # last row Z(gx) wraps to Z(first)=1 giving the product-closure check.
        cc.constraint(zns * (bvs + gamma) - zs * (avs + gamma))




def evaluate_composition(
    air: Air,
    trace_lde: jnp.ndarray,
    z_lde: jnp.ndarray | None,
    public_inputs: jnp.ndarray,
    alphas: list[int],
    gammas: list[int],
    n: int,
    cfg: StarkConfig,
    shift: int | None = None,
) -> jnp.ndarray:
    """Constraint composition over all LDE points: [nc, N] quotient values
    (divided by Z_H). Delegates to the segmented, row-blocked evaluator —
    see stark/composition.py for why the monolithic one-jit graph was
    replaced (Fq12-width graphs took hours of XLA compile)."""
    from .composition import evaluate_composition as _eval

    return _eval(
        air, trace_lde, z_lde, public_inputs, alphas, gammas, n, cfg,
        shift=shift,
    )


@functools.lru_cache(maxsize=None)
def _lde_selectors(n: int, rate_bits: int, shift: int = gl.GENERATOR) -> dict:
    """Host-precomputed selector vectors over the LDE coset (exact ints)."""
    n_lde = n << rate_bits
    log_lde = n_lde.bit_length() - 1
    w_big = gl.primitive_root_of_unity(log_lde)
    w_n = gl.primitive_root_of_unity(n.bit_length() - 1)
    g_last = pow(w_n, n - 1, gl.P)

    xs = np.empty(n_lde, dtype=np.uint64)
    acc = shift % gl.P
    for i in range(n_lde):
        xs[i] = acc
        acc = acc * w_big % gl.P

    s_n = pow(shift, n, gl.P)
    w_big_n = pow(w_big, n, gl.P)  # order = blowup
    zh = np.empty(n_lde, dtype=np.uint64)
    accz = s_n
    for i in range(n_lde):
        zh[i] = (accz - 1) % gl.P
        accz = accz * w_big_n % gl.P

    n_inv = pow(n, gl.P - 2, gl.P)
    zh_inv = np.array([pow(int(v), gl.P - 2, gl.P) for v in zh], dtype=np.uint64)
    l_first = np.array(
        [
            int(zh[i]) * n_inv % gl.P * pow((int(xs[i]) - 1) % gl.P, gl.P - 2, gl.P) % gl.P
            for i in range(n_lde)
        ],
        dtype=np.uint64,
    )
    l_last = np.array(
        [
            int(zh[i])
            * g_last
            % gl.P
            * n_inv
            % gl.P
            * pow((int(xs[i]) - g_last) % gl.P, gl.P - 2, gl.P)
            % gl.P
            for i in range(n_lde)
        ],
        dtype=np.uint64,
    )
    z_last = np.array([(int(x) - g_last) % gl.P for x in xs], dtype=np.uint64)
    return {
        "xs": xs,
        "zh": zh,
        "zh_inv": zh_inv,
        "l_first": l_first,
        "l_last": l_last,
        "z_last": z_last,
        "g_last": g_last,
    }


def prove(
    air: Air,
    trace: jnp.ndarray,  # [n, C] u64
    public_inputs: np.ndarray,  # [P] u64
    cfg: StarkConfig,
    timing=None,
    mesh=None,
) -> StarkProof:
    """mesh: optional jax.sharding.Mesh — commitments run shard-locally
    (column-sharded INTT/LDE -> all_to_all -> row-sharded leaf hashing) and
    every later stage operates on the row-sharded global arrays, GSPMD
    inserting collectives. The proof is byte-identical to the single-chip
    one (tests/test_parallel.py pins it); the reference's only parallelism
    is shared-memory rayon inside its prover crate (SURVEY.md §5)."""
    from ..utils.timing import TimingTree

    tt = timing if timing is not None else TimingTree("prove")

    if mesh is not None:
        from ..parallel.sharded import sharded_commit_tree

        def _commit(values, from_host: bool = False):
            return sharded_commit_tree(mesh, values, cfg)
    else:
        # The offload decision must see the PROVE's total retained LDE
        # footprint, not each matrix alone: at 2^19 rows the G1 trace and
        # aux LDEs are 3.4 GB + 3.3 GB — each under the per-matrix host-
        # offload threshold, together (plus the Pallas NTT's u32-pair
        # transients) a 16 GB chip OOM (observed twice). When the summed
        # trace+aux+quotient LDE bytes exceed the device budget, every
        # streaming-path commit keeps its LDE in host memory.
        from .logup import table_aux_width

        _aux_w = cfg.num_challenges * (
            len(air.permutation_pairs())
            + table_aux_width(air.lookup_tables())
            + air.aux_extra_width()
        )
        _total_lde_bytes = (
            (trace.shape[0] << cfg.fri.rate_bits)
            * (air.num_columns + _aux_w + cfg.num_challenges * QUOTIENT_CHUNKS)
            * 8
        )
        # 6 GiB default: the 16 GB chip must also hold the Pallas NTT's
        # u32-pair block transients, per-program temp reservations and the
        # composition/opening working sets next to the retained LDEs
        _force_offload = _total_lde_bytes > int(
            os.environ.get("STARKY_LDE_DEVICE_BYTES", 6 << 30)
        )

        def _commit(values, from_host: bool = False):
            if from_host and _force_offload and not isinstance(values[0], np.ndarray):
                # North-star scale: move the source columns to HOST before
                # the streaming commit. The remote pool releases freed
                # device buffers asynchronously, so right after the trace
                # commit + aux column build there is less headroom than the
                # live set suggests — committing from host bounds the
                # commit's device footprint to one block's transients
                # (observed: the 2^19 aux commit OOM'd in-prove while the
                # identical standalone commit succeeded).
                values = [np.asarray(values.pop())]
            return commit(values, cfg, offload=_force_offload or None)

    n, num_cols = trace.shape
    assert num_cols == air.num_columns, (num_cols, air.num_columns)
    assert n & (n - 1) == 0
    degree_bits = n.bit_length() - 1
    nc = cfg.num_challenges

    challenger = Challenger(parity=cfg.fri.parity)
    pi_arr = np.asarray(public_inputs, dtype=np.uint64)
    challenger.observe_elements(pi_arr)

    # 1. trace commitment
    with tt.scope("trace commit"):
        trace_c = _commit(trace)
    challenger.observe_cap(np.asarray(trace_c.tree.cap))

    # 2. auxiliary columns: permutation Z + logUp (committed together)
    pairs = air.permutation_pairs()
    tables = air.lookup_tables()
    extra_w = air.aux_extra_width()
    z_c = None
    gammas: list[int] = []
    if pairs or tables or extra_w:
        gammas = challenger.get_n_challenges(nc)
        build_on_host = mesh is None and _force_offload
        with tt.scope("aux (Z/logup) commit"):
            parts = []
            with tt.scope("column build"):  # nests under the aux scope
                if pairs:
                    p = compute_z_columns(trace, pairs, gammas)
                    parts.append(np.asarray(p) if build_on_host else p)
                if tables:
                    if build_on_host:
                        # north-star shapes: stream row blocks to a host
                        # buffer — the all-device build held the full aux
                        # block next to the subgroup trace and OOM'd 2^20
                        from .logup import compute_logup_columns_streamed

                        parts.append(
                            compute_logup_columns_streamed(
                                trace, tables, gammas
                            )
                        )
                    else:
                        from .logup import compute_logup_columns

                        parts.append(
                            compute_logup_columns(trace, tables, gammas)
                        )
                if extra_w:
                    aux_extra = air.generate_aux(np.asarray(trace), gammas)
                    parts.append(
                        np.asarray(aux_extra)
                        if build_on_host
                        else jnp.asarray(aux_extra)
                    )
                eng = np if build_on_host else jnp
                z_cols = (
                    parts[0] if len(parts) == 1 else eng.concatenate(parts, axis=1)
                )
                if not build_on_host and z_cols.size > _SYNC_CELLS:
                    # drain the column-build programs before the commit
                    # blocks enqueue (bounds coexisting program temps)
                    hard_sync(z_cols)
            del parts
            trace = None  # aux columns are built; composition reads trace_c.lde
            holder = [z_cols]
            del z_cols  # ownership moves into commit: freed before its concat
            with tt.scope("commit"):
                z_c = _commit(holder, from_host=True)
        challenger.observe_cap(np.asarray(z_c.tree.cap))

    # 3. constraint composition -> quotient chunks
    trace = None  # composition reads trace_c.lde; drop the subgroup values
    alphas = challenger.get_n_challenges(nc)
    with tt.scope("constraint composition"):
        if mesh is not None:
            from .composition import evaluate_composition_sharded

            qvals = evaluate_composition_sharded(
                mesh,
                air,
                trace_c.lde,
                z_c.lde if z_c else None,
                jnp.asarray(pi_arr),
                alphas,
                gammas,
                n,
                cfg,
            )  # [nc, N] (rows sharded along axis 1)
        else:
            qvals = evaluate_composition(
                air,
                trace_c.lde,
                z_c.lde if z_c else None,
                jnp.asarray(pi_arr),
                alphas,
                gammas,
                n,
                cfg,
            )  # [nc, N]
    # interpolate quotient over the LDE coset, split into degree-n chunks
    tt_q = tt.scope("quotient commit")
    tt_q.__enter__()
    q_coeffs = ntt.interpolate_coset(
        jnp.transpose(qvals), gl.GENERATOR
    )  # [N, nc]
    # degree < QUOTIENT_CHUNKS * n; truncate (higher coeffs vanish when the
    # constraints hold; a corrupted trace surfaces in verification instead)
    q_chunk_coeffs = []
    for k in range(nc):
        for j in range(QUOTIENT_CHUNKS):
            q_chunk_coeffs.append(q_coeffs[j * n : (j + 1) * n, k])
    q_chunk_coeffs = jnp.stack(q_chunk_coeffs, axis=1)  # [n, nc*chunks]
    q_lde = ntt.lde_from_coeffs(q_chunk_coeffs, cfg.fri.rate_bits)
    cap_h = min(cfg.fri.cap_height, q_lde.shape[0].bit_length() - 1)
    q_tree = merkle.build_merkle_tree(q_lde, cap_h, cfg.fri.merkle_hash)
    challenger.observe_cap(np.asarray(q_tree.cap))

    tt_q.__exit__(None, None, None)

    # 4. openings at zeta and g*zeta
    zeta = challenger.get_ext_challenge()
    zeta_arr = jnp.asarray(np.array(zeta, dtype=np.uint64))
    w_n = gl.primitive_root_of_unity(degree_bits)
    gzeta_arr = gl.mul(zeta_arr, jnp.asarray(np.uint64(w_n)))

    # 1/(zeta - x) over the LDE domain, shared by the barycentric openings
    # below and the batched-opening combine (step 5)
    xs_ext = gl.ext_from_base(jnp.asarray(_lde_selectors(n, cfg.fri.rate_bits)["xs"]))
    inv_den_zeta = _ext_inv_x_minus(xs_ext, zeta_arr)
    gzeta = (zeta[0] * w_n % gl.P, zeta[1] * w_n % gl.P)
    inv_den_gzeta = _ext_inv_x_minus(xs_ext, gzeta_arr)

    with tt.scope("openings"):
        trace_zeta = ntt.eval_from_lde(trace_c.lde, zeta, inv_den_zeta)
        trace_gzeta = ntt.eval_from_lde(trace_c.lde, gzeta, inv_den_gzeta)
        z_zeta = z_gzeta = None
        if z_c is not None:
            z_zeta = ntt.eval_from_lde(z_c.lde, zeta, inv_den_zeta)
            z_gzeta = ntt.eval_from_lde(z_c.lde, gzeta, inv_den_gzeta)
        quotient_zeta = ntt.eval_from_lde(q_lde, zeta, inv_den_zeta)

    # ONE D2H transfer for all five opening vectors (each np.asarray is a
    # separate tunnel round trip otherwise)
    trace_zeta, trace_gzeta, z_zeta, z_gzeta, quotient_zeta = jax.device_get(
        (trace_zeta, trace_gzeta, z_zeta, z_gzeta, quotient_zeta)
    )
    openings = StarkOpenings(
        trace_zeta=trace_zeta,
        trace_gzeta=trace_gzeta,
        z_zeta=z_zeta,
        z_gzeta=z_gzeta,
        quotient_zeta=quotient_zeta,
    )
    challenger.observe_elements(openings.flat_elements())

    # 5. FRI batch opening proof
    beta = challenger.get_ext_challenge()
    beta_arr = jnp.asarray(np.array(beta, dtype=np.uint64))

    zeta_mats = [trace_c.lde] + ([z_c.lde] if z_c else []) + [q_lde]
    zeta_ys = [trace_zeta] + ([z_zeta] if z_c else []) + [quotient_zeta]
    gzeta_mats = [trace_c.lde] + ([z_c.lde] if z_c else [])
    gzeta_ys = [trace_gzeta] + ([z_gzeta] if z_c else [])

    with tt.scope("opening combine"):
        f_values = _batch_opening_poly(
            zeta_mats, zeta_ys, inv_den_zeta, gzeta_mats, gzeta_ys, inv_den_gzeta,
            beta,
        )

    oracles = [(trace_c.tree, trace_c.lde)]
    if z_c is not None:
        oracles.append((z_c.tree, z_c.lde))
    oracles.append((q_tree, q_lde))

    with tt.scope("fri"):
        fri_proof = fri_prove(
            f_values, gl.GENERATOR, oracles, challenger, cfg.fri, timing=tt,
            mesh=mesh,
        )
    tt.finish()

    return StarkProof(
        degree_bits=degree_bits,
        trace_cap=np.asarray(trace_c.tree.cap),
        z_cap=np.asarray(z_c.tree.cap) if z_c else None,
        quotient_cap=np.asarray(q_tree.cap),
        openings=openings,
        fri=fri_proof,
        public_inputs=pi_arr,
    )


@jax.jit
def _ext_inv_x_minus(xs_ext, point):
    """1/(x - point) over the LDE domain — its own dispatch so the deep
    Fermat chain never shares a graph with the opening combine (the mix
    compiles pathologically; see the note above _gather_cols)."""
    den = gl.ext_sub(xs_ext, jnp.broadcast_to(point, xs_ext.shape))
    return gl.ext_inv(den)


@jax.jit
def _matvec_acc(s0, s1, m, w0, w1):
    """Accumulate the two base matvecs of one column chunk into (s0, s1)."""
    p0 = gl.sum_mod(gl.mul(m, w0[None, :]), axis=1)  # [N]
    p1 = gl.sum_mod(gl.mul(m, w1[None, :]), axis=1)
    return gl.add(s0, p0), gl.add(s1, p1)


@jax.jit
def _group_finish(s0, s1, c_acc, inv_den):
    s = jnp.stack([s0, s1], axis=-1)  # [N, 2]
    num = gl.ext_sub(s, jnp.broadcast_to(c_acc, s.shape))
    return gl.ext_mul(num, inv_den)


@jax.jit
def _f_combine(g0, g1, beta_k0):
    return gl.ext_add(g0, gl.ext_mul(g1, jnp.broadcast_to(beta_k0, g1.shape)))


def _batch_opening_poly(
    zeta_mats, zeta_ys, inv_den_zeta, gzeta_mats, gzeta_ys, inv_den_gzeta, beta
) -> jnp.ndarray:
    """F(x) = G_zeta(x) + beta^{k0} * G_gzeta(x), where each G is the
    beta-combined sum of (p_i(x) - y_i) / (x - point).

    Column-chunked: the round-1 single-jit version put the whole
    [N, total_width] modular matvec in ONE program — at the 2^20-row G1
    shape its multi-GB temp reservations crashed the remote TPU compiler.
    Chunking changes only the summation grouping; sums are exact mod p, so
    the values are bit-identical (canonical representation is unique).

    beta comes as host ints: the beta-power weights and the y-side constant
    accumulate in exact host numpy (the eager device version of
    ext_powers_vec cost ~2400 tunnel round trips — measured 4.9 s of an
    8.6 s prove); only the [N, chunk] matvecs and the final combines
    dispatch, each as one jitted call."""
    import os

    n_rows = zeta_mats[0].shape[0]
    chunk = max(int(os.environ.get("STARKY_OPEN_CHUNK_CELLS", 1 << 27)) // n_rows, 8)
    sync = n_rows * sum(m.shape[1] for m in zeta_mats) > (1 << 27)
    beta_np = np.array(beta, dtype=np.uint64)

    def group(mats, ys, inv_den):
        total = sum(m.shape[1] for m in mats)
        w = gl.ext_powers_vec(beta_np, total)  # [total, 2] host numpy
        s0 = jnp.zeros((n_rows,), dtype=jnp.uint64)
        s1 = jnp.zeros((n_rows,), dtype=jnp.uint64)
        c_acc = np.zeros((2,), dtype=np.uint64)
        off = 0
        for m, y in zip(mats, ys):
            k = m.shape[1]
            for c0 in range(0, k, chunk):
                wk = w[off + c0 : off + min(c0 + chunk, k)]
                s0, s1 = _matvec_acc(
                    s0, s1, m[:, c0 : min(c0 + chunk, k)], wk[:, 0], wk[:, 1]
                )
                if sync:
                    hard_sync(s0)
                    if isinstance(m, np.ndarray):
                        # each chunk forced a contiguous ~1 GB host copy of
                        # the non-contiguous column slice; return the freed
                        # arenas (host-OOM hygiene, utils/memhygiene.py)
                        from ..utils.memhygiene import trim

                        trim()
            c_acc = gl.ext_add(c_acc, _ext_dot(w[off : off + k], np.asarray(y)))
            off += k
        return _group_finish(s0, s1, jnp.asarray(c_acc), inv_den), total

    g0, k0 = group(zeta_mats, zeta_ys, inv_den_zeta)
    g1, _ = group(gzeta_mats, gzeta_ys, inv_den_gzeta)
    beta_k0 = gl.ext_pow_const(beta_np, k0)  # host numpy
    return _f_combine(g0, g1, jnp.asarray(beta_k0))


def _ext_dot(w: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """sum_t w_t * y_t for extension vectors w, y: [k, 2] -> [2]."""
    prod = gl.ext_mul(w, y)
    return gl.sum_mod(prod, axis=0)
