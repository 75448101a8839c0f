"""Packed-row extension vs the flat-gather extension (itself oracle-
validated) over real k-mer hits, with variable-length reads to exercise
the row-coordinate bound reductions."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from imsame_tpu.constants import FIXED_K
from imsame_tpu.index.kmer import build_index, pack_kmers
from imsame_tpu.io.fasta import parse_fasta_bytes
from imsame_tpu.ops.extend import extend_batch, raw_score_threshold
from imsame_tpu.ops.extend_packed import extend_packed, pack_read_rows
from util_synth import mutate, random_read


def _mk_seqinfos(rng, n=24, sub=0.08, indel=0.05):
    q = [random_read(rng, rng.randint(40, 110)) for _ in range(n)]
    db = [mutate(rng, r, sub, indel) for r in q[: n // 2]]
    db += [random_read(rng, rng.randint(40, 110)) for _ in range(n - n // 2)]
    qd = "".join(f">q{i}\n{r}\n" for i, r in enumerate(q)).encode()
    dd = "".join(f">d{i}\n{r}\n" for i, r in enumerate(db)).encode()
    return parse_fasta_bytes(qd), parse_fasta_bytes(dd)


def _bounds(si, r):
    if r == si.n_seqs - 1:
        return int(si.start[r]), si.total_len
    return int(si.start[r]), int(si.start[r + 1]) - 1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_packed_matches_flat(seed):
    rng = random.Random(seed)
    qi, di = _mk_seqinfos(rng)
    idx = build_index(di)

    cands = []
    for r in range(qi.n_seqs):
        s, e = int(qi.start[r]), qi.read_end(r)
        # include the boundary-straddling k-mer start (SURVEY.md 6.5)
        p0 = max(0, s - 1) if r > 0 else s
        for p in range(p0, e - FIXED_K + 1):
            key = int(pack_kmers(qi.codes, np.array([p], dtype=np.int64))[0])
            lo, hi = idx.lookup_range(key)
            for h in range(lo, hi):
                cands.append((int(idx.pos[h]), p + FIXED_K, r, int(idx.sid[h])))
    rng.shuffle(cands)
    cands = cands[:500]
    assert len(cands) > 40

    pos_db = np.array([c[0] for c in cands], np.int32)
    pos_q = np.array([c[1] for c in cands], np.int32)
    reads = np.array([c[2] for c in cands], np.int64)
    sids = np.array([c[3] for c in cands], np.int64)
    rxs = np.array([_bounds(di, s)[0] for s in sids], np.int32)
    rxe = np.array([_bounds(di, s)[1] for s in sids], np.int32)
    rys = np.array([_bounds(qi, r)[0] for r in reads], np.int32)
    rye = np.array([_bounds(qi, r)[1] for r in reads], np.int32)
    thr = raw_score_threshold(qi.read_lens(), di.total_len, 1e-20)
    raw_min = thr[reads].astype(np.int32)

    W = 128
    flat = extend_batch(
        jnp.asarray(di.codes), jnp.asarray(qi.codes),
        jnp.asarray(pos_db), jnp.asarray(pos_q),
        jnp.asarray(rxs), jnp.asarray(rxe),
        jnp.asarray(rys), jnp.asarray(rye),
        jnp.asarray(raw_min), window=W,
    )

    qlens = qi.read_lens()
    dlens = di.read_lens()
    qp = pack_read_rows(qi.codes, qi.start, qlens, W)
    dp = pack_read_rows(di.codes, di.start, dlens, W)
    packed = extend_packed(
        jnp.asarray(qp), jnp.asarray(dp),
        jnp.asarray(reads.astype(np.int32)),
        jnp.asarray(sids.astype(np.int32)),
        jnp.asarray(pos_q - qi.start[reads].astype(np.int32)),
        jnp.asarray(pos_db - di.start[sids].astype(np.int32)),
        jnp.asarray(qlens[reads].astype(np.int32)),
        jnp.asarray(dlens[sids].astype(np.int32)),
        jnp.asarray(raw_min), W=W,
    )

    np.testing.assert_array_equal(np.asarray(packed.raw), np.asarray(flat.raw))
    np.testing.assert_array_equal(
        np.asarray(packed.passes), np.asarray(flat.passes)
    )
    np.testing.assert_array_equal(
        np.asarray(packed.t_len), np.asarray(flat.t_len)
    )
    np.testing.assert_array_equal(
        np.asarray(packed.idents), np.asarray(flat.idents)
    )


def test_pack_read_rows_layout():
    codes = np.array([0, 1, 2, 3] * 10, np.uint8)
    start = np.array([0, 7], np.int64)
    lens = np.array([7, 33], np.int64)
    rows = pack_read_rows(codes, start, lens, 48)
    assert rows.shape == (2, 3)
    # base b of row i = bits 2*(b%16) of word b//16
    for i in range(2):
        for b in range(int(lens[i])):
            got = (rows[i, b // 16] >> np.uint32(2 * (b % 16))) & np.uint32(3)
            assert got == codes[start[i] + b]
    # padding past the read length is zero
    assert (rows[0, 1:] == 0).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_exactness_flag(seed):
    """Candidates flagged exact at W=32 must produce identical results at
    the full window; the flag must be common (it powers the cheap tier)."""
    rng = random.Random(seed)
    qi, di = _mk_seqinfos(rng, n=40)
    idx = build_index(di)

    cands = []
    for r in range(qi.n_seqs):
        s, e = int(qi.start[r]), qi.read_end(r)
        for p in range(s, e - FIXED_K + 1):
            key = int(pack_kmers(qi.codes, np.array([p], dtype=np.int64))[0])
            lo, hi = idx.lookup_range(key)
            for h in range(lo, hi):
                cands.append((int(idx.pos[h]), p + FIXED_K, r, int(idx.sid[h])))
    assert cands
    pos_db = np.array([c[0] for c in cands], np.int32)
    pos_q = np.array([c[1] for c in cands], np.int32)
    reads = np.array([c[2] for c in cands], np.int64)
    sids = np.array([c[3] for c in cands], np.int64)
    thr = raw_score_threshold(qi.read_lens(), di.total_len, 1e-20)
    raw_min = thr[reads].astype(np.int32)
    qlens = qi.read_lens()
    dlens = di.read_lens()
    W = 128
    qp = jnp.asarray(pack_read_rows(qi.codes, qi.start, qlens, W))
    dp = jnp.asarray(pack_read_rows(di.codes, di.start, dlens, W))
    args = (
        qp, dp,
        jnp.asarray(reads.astype(np.int32)), jnp.asarray(sids.astype(np.int32)),
        jnp.asarray(pos_q - qi.start[reads].astype(np.int32)),
        jnp.asarray(pos_db - di.start[sids].astype(np.int32)),
        jnp.asarray(qlens[reads].astype(np.int32)),
        jnp.asarray(dlens[sids].astype(np.int32)),
        jnp.asarray(raw_min),
    )
    small = extend_packed(*args, W=32)
    full = extend_packed(*args, W=W)
    ex = np.asarray(small.exact)
    np.testing.assert_array_equal(
        np.asarray(small.passes)[ex], np.asarray(full.passes)[ex]
    )
    np.testing.assert_array_equal(
        np.asarray(small.raw)[ex], np.asarray(full.raw)[ex]
    )
    # Some candidates must be decidable in the small window (true-pair
    # hits legitimately outrun it; the tier's payoff on random-dominated
    # workloads is covered by the pipeline parity tests + bench).
    assert ex.any() and (~ex).any()


def test_rows_from_stream_matches_pack_read_rows():
    """Device-side row packing from the 2-bit stream is bit-identical to
    the host packer, including padding rows (len 0) and odd offsets."""
    import numpy as np
    import jax.numpy as jnp

    from imsame_tpu.ops.extend_packed import (
        pack_read_rows,
        pack_stream,
        rows_from_stream,
    )

    rng = np.random.default_rng(3)
    lens = rng.integers(1, 300, 37).astype(np.int64)
    start = np.concatenate(([0], np.cumsum(lens)[:-1]))
    codes = rng.integers(0, 4, int(lens.sum()), dtype=np.uint8)
    for row_len in (128, 256, 512):
        want = pack_read_rows(codes, start, lens, row_len)
        # include zero-length padding rows like the engine's pow2 padding
        start_p = np.concatenate([start, [0, 0, 0]]).astype(np.int32)
        lens_p = np.concatenate([lens, [0, 0, 0]]).astype(np.int32)
        got = np.asarray(rows_from_stream(
            jnp.asarray(pack_stream(codes)),
            jnp.asarray(start_p), jnp.asarray(lens_p), row_len=row_len,
        ))
        np.testing.assert_array_equal(want, got[:37])
        assert not got[37:].any()


def test_flat_gate_seg_matches_packed():
    """Segment-encoded gate (4 B/candidate) == 8-byte packed gate on a
    random stream with realistic structure (read-major order, qoff
    non-decreasing per read, delta overflows forcing extra segments)."""
    import jax.numpy as jnp

    from imsame_tpu.ops.candidates import (
        encode_seg_chunk,
        flat_gate_packed,
        flat_gate_seg,
    )

    rng = np.random.default_rng(11)
    n_q, n_db, L = 64, 64, 256
    W = L // 16
    qp = rng.integers(0, 2 ** 32, (n_q, W), dtype=np.uint32)
    dp = rng.integers(0, 2 ** 32, (n_db, W), dtype=np.uint32)
    qlen = rng.integers(100, 250, n_q).astype(np.int32)
    dlen = rng.integers(100, 250, n_db).astype(np.int32)
    n_idx = 500
    idx_tab = (
        (rng.integers(0, n_db, n_idx).astype(np.uint32) << np.uint32(12))
        | rng.integers(12, 200, n_idx).astype(np.uint32)
    ).view(np.int32)
    thr = rng.integers(-50, 200, n_q).astype(np.int32)

    N = 300
    rids = np.sort(rng.integers(0, n_q, N)).astype(np.int32)
    qoffs = np.empty(N, np.int32)
    for r in np.unique(rids):
        m = rids == r
        qoffs[m] = np.sort(
            rng.integers(12, 250, int(m.sum()))
        ).astype(np.int32)
    hits = rng.integers(0, n_idx, N).astype(np.int32)

    size = 512
    cand = np.zeros((2, size), np.int32)
    cand[0, :N] = hits
    rq = (rids.astype(np.uint32) << np.uint32(12)) | qoffs.astype(np.uint32)
    cand[1, :N] = rq.view(np.int32)
    a = jnp.asarray
    ref = np.asarray(
        flat_gate_packed(
            a(qp), a(dp), a(qlen), a(dlen), a(idx_tab), a(cand), a(thr),
            window=64, packed_idx=True,
        )
    )
    c1, rtab, rbase = encode_seg_chunk(rids, qoffs, hits, size)
    cap = 256
    assert len(rtab) <= cap
    rt = np.zeros(cap, np.int32)
    rb = np.zeros(cap, np.int32)
    rt[: len(rtab)] = rtab
    rb[: len(rtab)] = rbase
    got = np.asarray(
        flat_gate_seg(
            a(qp), a(dp), a(qlen), a(dlen), a(idx_tab), a(c1), a(rt),
            a(rb), a(thr), window=64, packed_idx=True,
        )
    )

    def unpack(bits):
        pb = np.ascontiguousarray(bits, dtype="<u4")
        return np.unpackbits(
            pb.view(np.uint8).reshape(2, -1), axis=1, bitorder="little"
        )[:, :N]

    np.testing.assert_array_equal(unpack(got), unpack(ref))
