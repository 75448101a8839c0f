"""Sharded stages on an 8-device CPU mesh: dict-sharded lookup and
data-parallel extension/NW must match the single-device ops."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imsame_tpu.index.kmer import build_index, rolling_keys
from imsame_tpu.io.fasta import parse_fasta_bytes
from imsame_tpu.ops.extend import extend_batch, raw_score_threshold
from imsame_tpu.ops.nw import nw_forward_batch
from imsame_tpu.ops.traceback import traceback_batch
from imsame_tpu.parallel.mesh import make_mesh
from imsame_tpu.parallel.sharded import (
    make_dict_sharded_lookup,
    make_sharded_extend,
    make_sharded_nw,
    shard_index_arrays,
)
from util_synth import mutate, random_read


def _seqinfos(seed, n=24, L=96):
    rng = random.Random(seed)
    q = [random_read(rng, L) for _ in range(n)]
    db = [mutate(rng, r, 0.06, 0.03) for r in q[: n // 2]]
    db += [random_read(rng, L) for _ in range(n - n // 2)]
    qd = "".join(f">q{i}\n{r}\n" for i, r in enumerate(q)).encode()
    dd = "".join(f">d{i}\n{r}\n" for i, r in enumerate(db)).encode()
    return parse_fasta_bytes(qd), parse_fasta_bytes(dd)


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dict_sharded_lookup_counts():
    qi, di = _seqinfos(0)
    idx = build_index(di)
    n_shards = 4
    keys_sh, pos_sh, sid_sh, _ = shard_index_arrays(
        idx.keys, idx.pos.astype(np.int32), idx.sid.astype(np.int32), n_shards
    )
    mesh = make_mesh(n_data=2, n_dict=4)
    q_keys = rolling_keys(qi.codes)[:256]
    lookup = make_dict_sharded_lookup(mesh, keys_sh.shape[1], len(q_keys))
    counts, _ = lookup(jnp.asarray(keys_sh), jnp.asarray(q_keys))
    want_lo = np.searchsorted(idx.keys, q_keys, "left")
    want_hi = np.searchsorted(idx.keys, q_keys, "right")
    np.testing.assert_array_equal(np.asarray(counts), want_hi - want_lo)


def test_sharded_extend_matches_single():
    qi, di = _seqinfos(1)
    idx = build_index(di)
    mesh = make_mesh(n_data=8, n_dict=1)
    W = 128
    # build candidates from real hits
    N = 64
    rng = random.Random(2)
    cands = []
    for r in range(qi.n_seqs):
        s, e = int(qi.start[r]), qi.read_end(r)
        for p in range(s, e - 11):
            key = int(rolling_keys(qi.codes)[p])
            lo, hi = idx.lookup_range(key)
            for h in range(lo, hi):
                cands.append((int(idx.pos[h]), p + 12, r, int(idx.sid[h])))
    rng.shuffle(cands)
    cands = (cands * 8)[:N]
    pos_db = np.array([c[0] for c in cands], np.int32)
    pos_q = np.array([c[1] for c in cands], np.int32)
    reads = np.array([c[2] for c in cands])
    sids = np.array([c[3] for c in cands])

    def bounds(si, rr):
        st = si.start.astype(np.int64)
        s0 = st[rr]
        e0 = np.where(
            rr == si.n_seqs - 1,
            si.total_len,
            st[np.minimum(rr + 1, si.n_seqs - 1)] - 1,
        )
        return s0.astype(np.int32), e0.astype(np.int32)

    rxs, rxe = bounds(di, sids)
    rys, rye = bounds(qi, reads)
    thr = raw_score_threshold(qi.read_lens(), di.total_len, 1e-20)[reads]

    args = [
        jnp.asarray(a)
        for a in (di.codes, qi.codes, pos_db, pos_q, rxs, rxe, rys, rye, thr)
    ]
    single = extend_batch(*args, window=W)
    step = make_sharded_extend(mesh, W)
    raw_sh, pass_sh = step(*args)
    np.testing.assert_array_equal(np.asarray(single.raw), np.asarray(raw_sh))
    np.testing.assert_array_equal(np.asarray(single.passes), np.asarray(pass_sh))


def test_sharded_nw_matches_single():
    rng = random.Random(3)
    mesh = make_mesh(n_data=8, n_dict=1)
    L = 64
    B = 16
    Xb = np.zeros((B, L), np.uint8)
    Yb = np.zeros((B, L), np.uint8)
    xl = np.zeros(B, np.int32)
    yl = np.zeros(B, np.int32)
    for b in range(B):
        lx = rng.randrange(16, L)
        X = np.array([rng.randrange(4) for _ in range(lx)], np.uint8)
        Y = X.copy()
        for _ in range(4):
            Y[rng.randrange(len(Y))] = rng.randrange(4)
        Xb[b, :lx] = X
        Yb[b, : len(Y)] = Y
        xl[b], yl[b] = lx, len(Y)

    single = nw_forward_batch(
        jnp.asarray(Xb), jnp.asarray(Yb), jnp.asarray(xl), jnp.asarray(yl),
        -5, -2, max_len=L,
    )
    tb = traceback_batch(
        single.bp, single.best_i, single.best_j, jnp.asarray(Xb),
        jnp.asarray(Yb), max_len=L,
    )
    from imsame_tpu.parallel.sharded import min_length_for_coverage

    min_len = min_length_for_coverage(yl, 0.5)
    step = make_sharded_nw(mesh, L)
    lengths, idents, n_cov, kcells = step(
        jnp.asarray(Xb), jnp.asarray(Yb), jnp.asarray(xl), jnp.asarray(yl),
        jnp.asarray(-5, jnp.int32), jnp.asarray(-2, jnp.int32),
        jnp.asarray(min_len),
    )
    np.testing.assert_array_equal(np.asarray(tb.length), np.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(tb.identities), np.asarray(idents))
    # device-side coverage tally equals the host-side gate
    want = int(np.sum(np.asarray(tb.length) / yl >= 0.5))
    assert int(np.asarray(n_cov)[0]) == want
    assert int(np.asarray(kcells)[0]) == int(
        np.sum((xl.astype(np.int64) * yl) // 1024)
    )


def test_production_compare_step_runs():
    """The multichip dry-run step (production kernels under shard_map)
    compiles and executes on the virtual mesh; gate results match the
    single-device flat gate."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
