"""Sharded pipeline stages: shard_map over the ('data', 'dict') mesh.

The reference's only in-process parallelism is a static pthread split of
query reads over a shared read-only dictionary (src/IMSAME.c:414-462).  The
TPU-native equivalents built here:

  * data axis: query read/candidate batches are sharded; the extension and
    NW stages run per-shard with no cross-shard traffic; accepted counts
    and DP-cell tallies merge with psum.
  * dict axis: the sorted k-mer index is sharded by key range.  A query
    k-mer batch (replicated along 'dict') is looked up in each shard's
    local arrays; per-shard bucket counts merge with psum, and hit lists
    ride an all_gather -- the collective-merge design from SURVEY.md
    sections 2a/5.8.  Because each key lives in exactly one shard, the
    merged counts equal the unsharded lookup.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..constants import POINT
from ..ops.extend import extend_batch
from ..ops.nw import nw_forward_batch
from ..ops.traceback import traceback_batch


# ----------------------------------------------------------------------
# Dictionary sharding (key-range partition of the sorted index)
# ----------------------------------------------------------------------

def shard_index_arrays(
    keys: np.ndarray, pos: np.ndarray, sid: np.ndarray, n_shards: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Partition the sorted index into n_shards contiguous key ranges of
    equal entry count (padded).  Returns (keys_sh, pos_sh, sid_sh, count_sh)
    with shapes [n_shards, cap]; padding uses key=uint32 max so searchsorted
    never matches it."""
    n = len(keys)
    cap = -(-max(n, 1) // n_shards)
    keys_sh = np.full((n_shards, cap), np.iinfo(np.uint32).max, np.uint32)
    pos_sh = np.zeros((n_shards, cap), np.int32)
    sid_sh = np.zeros((n_shards, cap), np.int32)
    count_sh = np.zeros((n_shards,), np.int32)
    # Split on key boundaries so one key never straddles shards.
    bounds = [0]
    for s in range(1, n_shards):
        b = min(n, s * cap)
        # move boundary left to a key change
        while b > bounds[-1] and b < n and keys[b] == keys[b - 1]:
            b -= 1
        bounds.append(max(b, bounds[-1]))
    bounds.append(n)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        m = hi - lo
        if m > cap:  # giant single-key bucket; widen cap
            raise ValueError("index shard capacity exceeded; raise n_shards")
        keys_sh[s, :m] = keys[lo:hi]
        pos_sh[s, :m] = pos[lo:hi]
        sid_sh[s, :m] = sid[lo:hi]
        count_sh[s] = m
    return keys_sh, pos_sh, sid_sh, count_sh


def make_dict_sharded_lookup(mesh: Mesh, cap: int, n_query_keys: int):
    """Returns a jitted lookup: (keys_sh, q_keys) -> (counts, local_lo).

    counts[k] = total bucket size of q_keys[k] across shards (psum'd);
    the per-shard local ranges stay sharded for the gather stage."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dict", None), P(None)),
        out_specs=(P(None), P("dict", None)),
        check_vma=False,
    )
    def lookup(keys_shard, q_keys):
        ks = keys_shard[0]  # [cap] local sorted keys (padded with max)
        lo = jnp.searchsorted(ks, q_keys, side="left")
        hi = jnp.searchsorted(ks, q_keys, side="right")
        cnt = (hi - lo).astype(jnp.int32)
        total = jax.lax.psum(cnt, "dict")
        return total, lo.astype(jnp.int32)[None, :]

    return jax.jit(lookup)


# ----------------------------------------------------------------------
# Data-parallel extension + NW stages
# ----------------------------------------------------------------------

def make_sharded_extend(mesh: Mesh, window: int):
    """Data-parallel ungapped extension: candidates sharded over 'data',
    sequence arrays replicated."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None), P(None),
            P("data"), P("data"), P("data"), P("data"),
            P("data"), P("data"), P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    def step(db_codes, q_codes, pos_db, pos_q, rxs, rxe, rys, rye, raw_min):
        res = extend_batch(
            db_codes, q_codes, pos_db, pos_q, rxs, rxe, rys, rye, raw_min,
            window=window,
        )
        return res.raw, res.passes

    return jax.jit(step)


def make_sharded_nw(mesh: Mesh, max_len: int):
    """Data-parallel gapped alignment + traceback stats over read pairs;
    returns per-pair stats (sharded) plus psum'd accepted totals."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("data", None), P("data", None), P("data"), P("data"),
            P(), P(), P("data"),
        ),
        out_specs=(P("data"), P("data"), P(None), P(None)),
        check_vma=False,
    )
    def step(X, Y, xlen, ylen, igap, egap, min_length):
        res = nw_forward_batch(X, Y, xlen, ylen, igap, egap, max_len=max_len)
        tb = traceback_batch(
            res.bp, res.best_i, res.best_j, X, Y, max_len=max_len
        )
        # The authoritative accept gates run on the host in float64
        # (pipeline.py); here we psum an exact *coverage* tally using the
        # host-precomputed per-pair integer threshold min_length[b] =
        # ceil-compare of min_coverage * ylen (device int32 compare is
        # exact), plus the DP-cell tally in kilocells (int32-safe).
        cov_ok = (tb.length >= min_length).astype(jnp.int32)
        n_cov = jax.lax.psum(jnp.sum(cov_ok), "data")
        kcells = jax.lax.psum(
            jnp.sum((xlen.astype(jnp.int32) * ylen.astype(jnp.int32)) // 1024),
            "data",
        )
        return tb.length, tb.identities, n_cov[None], kcells[None]

    return jax.jit(step)


def min_length_for_coverage(ylen, min_coverage: float):
    """Smallest integer alignment length passing length/ylen >= min_coverage,
    computed on the host in float64 (exact boundary semantics)."""
    import numpy as np

    yl = np.asarray(ylen, np.float64)
    t = min_coverage * yl
    ceil_t = np.ceil(t)
    # length >= t; if t is an exact integer the gate is >=, else next int up.
    return np.where(ceil_t == t, t, ceil_t).astype(np.int32)


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def data_sharded(mesh: Mesh, x):
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


# ----------------------------------------------------------------------
# Production-kernel sharded stages (packed-row gate + fused NW resolve)
# ----------------------------------------------------------------------

def make_sharded_packed_gate(mesh: Mesh, window: int):
    """Data-parallel flat candidate gate over the *production* packed-row
    extension (ops/extend_packed.py via ops/candidates.gate_core):
    candidate vectors sharded over 'data', packed read rows and index
    payload replicated (they are the 'model').  Returns sharded pass
    bools plus a psum'd pass count."""
    from ..ops.candidates import gate_core

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(), P(),
            P("data"), P("data"), P("data"), P("data"),
        ),
        out_specs=(P("data"), P(None)),
        check_vma=False,
    )
    def step(qp, dp, qlen, dlen, idx_pos, idx_sid, db_start,
             r, hit, qoff, thr):
        passes, _exact = gate_core(
            qp, dp, qlen, dlen, idx_pos, idx_sid, db_start,
            r, hit, qoff, thr, window=window,
        )
        n_pass = jax.lax.psum(jnp.sum(passes.astype(jnp.int32)), "data")
        return passes, n_pass[None]

    return jax.jit(step)


def make_sharded_nw_resolve(mesh: Mesh, max_len: int, use_pallas: bool):
    """Data-parallel fused gather->NW->traceback (ops/resolve.py) over
    read-pair index vectors sharded on 'data'; packed rows replicated.
    Returns per-pair stats (sharded) and a psum'd coverage tally."""
    from ..ops.resolve import nw_traceback_rows

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),
            P("data"), P("data"), P(), P(), P("data"),
        ),
        out_specs=(P("data"), P("data"), P("data"), P(None)),
        check_vma=False,
    )
    def step(qp, dp, qlen, dlen, r, s, igap, egap, min_length):
        res = nw_traceback_rows(
            qp, dp, r, s, qlen, dlen, igap, egap,
            max_len=max_len, use_pallas=use_pallas,
        )
        cov_ok = (res.length >= min_length).astype(jnp.int32)
        n_cov = jax.lax.psum(jnp.sum(cov_ok), "data")
        return res.length, res.identities, res.n_steps, n_cov[None]

    return jax.jit(step)


def make_production_compare_step(
    mesh: Mesh, cap: int, window: int, max_len: int, use_pallas: bool = False
):
    """Full multi-chip compare step over the production kernels:

      dict axis:  key-range-sharded k-mer lookup (psum-merged counts)
      data axis:  packed-row extension gate, then fused NW + traceback
      collectives: psum of pass counts and coverage tallies

    This is the step dryrun_multichip compiles and executes; on real
    hardware the same structure runs with use_pallas=True."""
    lookup = make_dict_sharded_lookup(mesh, cap, 0)
    gate = make_sharded_packed_gate(mesh, window)
    nw = make_sharded_nw_resolve(mesh, max_len, use_pallas)

    @jax.jit
    def step(
        keys_sh, q_keys,
        qp, dp, qlen, dlen, idx_pos, idx_sid, db_start,
        r_c, hit_c, qoff_c, thr_c,
        r_p, s_p, igap, egap, min_length,
    ):
        counts, _ = lookup(keys_sh, q_keys)
        passes, n_pass = gate(
            qp, dp, qlen, dlen, idx_pos, idx_sid, db_start,
            r_c, hit_c, qoff_c, thr_c,
        )
        lengths, idents, n_steps, n_cov = nw(
            qp, dp, qlen, dlen, r_p, s_p, igap, egap, min_length
        )
        return counts, passes, n_pass, lengths, idents, n_steps, n_cov

    return step
