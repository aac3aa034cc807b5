"""Sharded proving pipeline over a jax.sharding.Mesh.

The trace's two natural parallel axes (SURVEY.md section 2's parallelism
mapping) are columns (hundreds of independent polynomials for NTT/LDE) and
rows (constraint evaluation, Merkle leaves). The pipeline:

  1. column-sharded INTT + coset LDE       — fully local, zero collectives
     (the NTT runs along rows, which every device holds completely for its
     column slice);
  2. all_to_all reshard columns -> rows    — one collective transpose;
  3. row-sharded Merkle leaf hashing + local subtrees, then an all_gather of
     the per-device subtree roots finishes the tiny top levels everywhere;
  4. row-sharded constraint composition    — `next` rows that cross a shard
     boundary arrive by ppermute from the right neighbor.

FRI folding currently gathers the (small) batched-opening polynomial and
folds replicated; distributing the first folds over ICI is the next
optimization. The reference has no distributed path at all (rayon only,
SURVEY.md section 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import goldilocks as gl
from .. import ntt, poseidon


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    fell_back = False
    if n_devices is not None and len(devs) < n_devices:
        # the default platform (e.g. one tunneled TPU chip) is smaller than
        # the requested mesh: fall back to the virtual CPU devices
        # (--xla_force_host_platform_device_count), the multi-chip dry-run
        # substrate in this single-chip environment.
        try:
            devs = jax.local_devices(backend="cpu")
            fell_back = True
        except RuntimeError:
            pass
    if n_devices is not None:
        devs = devs[:n_devices]
        if len(devs) < n_devices:
            # never hand back a silently-shrunken mesh (ADVICE r3): a prove
            # "across 8 chips" quietly running on 2 is a correctness-of-
            # deployment bug, not a fallback.
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devs)} devices available "
                f"(default platform + cpu fallback); set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                f"for a virtual mesh or request a smaller one"
            )
        if fell_back:
            import warnings

            warnings.warn(
                f"make_mesh({n_devices}): default platform has fewer devices; "
                f"using {len(devs)} virtual CPU devices (dry-run substrate)",
                stacklevel=2,
            )
    return Mesh(np.array(devs), (axis,))


def pad_cols(x: jnp.ndarray, d: int) -> jnp.ndarray:
    c = x.shape[1]
    pad = (-c) % d
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def sharded_commit(mesh: Mesh, values: jnp.ndarray, rate_bits: int, cap_height: int):
    """Distributed trace commitment.

    values: [n, C] (will be padded to a multiple of the mesh size in C).
    Returns (lde row-sharded [N, C_pad], leaf digests [N, 4], cap [2^cap, 4]).
    """
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    values = pad_cols(values, d)
    n, c = values.shape
    big_n = n << rate_bits
    assert big_n % d == 0 and (big_n // d) >= (1 << cap_height) // d

    col_sharding = NamedSharding(mesh, P(None, axis))
    values = jax.device_put(values, col_sharding)

    from .. import pallas as _pallas

    mesh_pallas = _pallas.mesh_pallas_enabled()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(axis, None), P(axis, None)),
        # pallas_call outputs carry no vma annotation; with mesh-Pallas on,
        # skip the check (outputs are per-shard local values either way)
        check_vma=not mesh_pallas,
    )
    def commit_local(vals):
        # vals: [n, C/d] local columns — local NTT along rows
        coeffs = ntt.interpolate_coeffs(vals)
        lde = ntt.lde_from_coeffs(coeffs, rate_bits)  # [N, C/d]
        # collective transpose: columns -> rows
        # [N, C/d] -> [d, N/d, C/d] -> all_to_all -> [d, N/d, C/d] gathered
        blocks = lde.reshape(d, big_n // d, c // d)
        swapped = jax.lax.all_to_all(blocks, axis, 0, 0, tiled=False)
        # swapped: [d, N/d, C/d]; concat the column blocks back together
        rows = jnp.concatenate([swapped[k] for k in range(d)], axis=1)  # [N/d, C]
        digests = poseidon.hash_or_noop(rows)  # [N/d, 4]
        return rows, digests

    import contextlib

    with contextlib.nullcontext() if mesh_pallas else _pallas.xla_only():
        lde_rows, leaf_digests = commit_local(values)

    # finish the tree: local subtrees then replicated top
    levels = _tree_levels(mesh, leaf_digests, cap_height, big_n)
    return lde_rows, levels


def _tree_levels(mesh: Mesh, leaf_digests: jnp.ndarray, cap_height: int, big_n: int):
    """Builds all Merkle levels: per-shard subtrees + replicated top levels."""
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    local_n = big_n // d

    # local subtrees reduce to one root per device, then the (tiny) top
    # levels run replicated from an all_gather of the subtree roots.
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(None, None),
        check_vma=False,
    )
    def subtree_root(digests):
        cur = digests
        while cur.shape[0] > 1:
            cur = poseidon.compress(cur[0::2], cur[1::2])
        return jax.lax.all_gather(cur, axis).reshape(-1, 4)

    roots = subtree_root(leaf_digests)  # [d, 4] replicated
    cap_size = 1 << cap_height
    cur = roots
    tops = [roots]
    while cur.shape[0] > cap_size:
        cur = poseidon.compress(cur[0::2], cur[1::2])
        tops.append(cur)
    return {"leaf_digests": leaf_digests, "subtree_roots": roots, "cap": tops[-1]}


def sharded_commit_tree(mesh: Mesh, values, cfg):
    """Distributed drop-in for `stark.prover.commit`: returns a `Commitment`
    whose LDE is a row-sharded global array and whose Merkle levels are
    global arrays (leaf level row-sharded, upper levels GSPMD-placed), so
    every downstream consumer (composition blocks, openings, FRI oracles,
    batched path extraction) runs unchanged on the global view while the
    heavy INTT/LDE/hash work executes shard-locally.

    Bit-identity with the single-chip commit: columns are zero-padded to a
    multiple of the mesh size for the local NTT only and sliced back off
    after the all_to_all transpose, so the hashed rows — and therefore every
    digest, cap and transcript downstream — are exactly the single-chip ones
    (pinned by tests/test_parallel.py)."""
    from .. import merkle
    from ..hashing import get_hasher
    from ..stark.prover import Commitment

    hasher = cfg.fri.merkle_hash
    hasher_mod = get_hasher(hasher)
    if isinstance(values, list):
        values = values.pop()
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    rate_bits = cfg.fri.rate_bits
    n, c = values.shape
    values = pad_cols(jnp.asarray(values), d)
    c_pad = values.shape[1]
    big_n = n << rate_bits
    assert big_n % d == 0

    col_sharding = NamedSharding(mesh, P(None, axis))
    values = jax.device_put(values, col_sharding)

    from .. import pallas as _pallas

    mesh_pallas = _pallas.mesh_pallas_enabled()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=not mesh_pallas,  # see sharded_commit
    )
    def commit_local(vals):
        coeffs = ntt.interpolate_coeffs(vals)
        lde = ntt.lde_from_coeffs(coeffs, rate_bits)  # [N, c_pad/d]
        blocks = lde.reshape(d, big_n // d, c_pad // d)
        swapped = jax.lax.all_to_all(blocks, axis, 0, 0, tiled=False)
        rows = jnp.concatenate([swapped[k] for k in range(d)], axis=1)
        rows = rows[:, :c]  # drop NTT-only zero padding before hashing
        digests = hasher_mod.hash_or_noop(rows)
        return rows, digests

    import contextlib

    with contextlib.nullcontext() if mesh_pallas else _pallas.xla_only():
        lde_rows, digests = commit_local(values)
    cap_h = min(cfg.fri.cap_height, big_n.bit_length() - 1)
    levels = [digests] + list(merkle._upper_levels(digests, cap_h, hasher))
    return Commitment(
        lde=lde_rows, tree=merkle.MerkleTree(levels=levels, cap_height=cap_h)
    )


def sharded_fri_fold(
    mesh: Mesh,
    values: jnp.ndarray,  # [m, 2] ext values, row-sharded or to be sharded
    beta: tuple[int, int],
    w_m_inv: int,
    s_inv: int,
) -> jnp.ndarray:
    """Distributed arity-4 FRI fold: rows stay sharded across the mesh and
    GSPMD inserts the collectives for the quarter-offset quad slices
    (v[j], v[j+q], v[j+2q], v[j+3q] live on different shards). The output
    [m/4, 2] comes back row-sharded for the next layer. Bit-identical to
    the single-chip fri._fold_step4 (tests pin this on the CPU mesh)."""
    from ..stark import fri

    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    values = jax.device_put(values, sh)
    beta_arr = jnp.asarray(np.array(beta, dtype=np.uint64))

    @functools.partial(jax.jit, out_shardings=sh)
    def fold(v):
        return fri._fold_step4(
            v, beta_arr, jnp.asarray(np.uint64(w_m_inv)), jnp.asarray(np.uint64(s_inv))
        )

    return fold(values)


def sharded_composition(
    mesh: Mesh,
    eval_rows_fn,
    lde_rows: jnp.ndarray,
    blowup: int,
):
    """Row-sharded constraint evaluation: each device evaluates its row block;
    the `next` rows for the last `blowup` local rows come from the right
    neighbor by ppermute (cyclic)."""
    d = mesh.devices.size
    axis = mesh.axis_names[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis)
    )
    def run(rows):
        head = rows[:blowup]  # my first rows -> left neighbor's tail `next`
        perm = [(i, (i - 1) % d) for i in range(d)]
        neighbor_head = jax.lax.ppermute(head, axis, perm)
        nxt = jnp.concatenate([rows[blowup:], neighbor_head], axis=0)
        return eval_rows_fn(rows, nxt)

    return run(lde_rows)
