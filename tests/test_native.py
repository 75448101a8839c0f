"""Native host runtime (imsame_tpu/native/host.c) vs numpy-path parity.

The C routines must be bit-identical to the vectorized numpy formulations
they replace; the pipeline picks whichever is available, so any divergence
would silently change accept sets.
"""

import numpy as np
import pytest

from imsame_tpu import native
from imsame_tpu.constants import FIXED_K
from imsame_tpu.index.kmer import KmerIndex, build_index, rolling_keys
from imsame_tpu.io.fasta import SeqInfo, parse_fasta_bytes, valid_db_kmer_starts

pytestmark = pytest.mark.skipif(
    native.lib is None, reason="native host library unavailable"
)


def synth_fasta(
    n_reads: int, read_len: int, seed: int, with_invalid: bool = False,
    ragged: bool = False,
) -> bytes:
    """FASTA bytes; optional non-ACGT chars (window resets) / ragged lens."""
    rng = np.random.default_rng(seed)
    out = []
    bases = np.frombuffer(b"ACGT", np.uint8)
    for i in range(n_reads):
        L = read_len
        if ragged:
            L = int(rng.integers(5, read_len + 1))  # some reads < k
        seq = bases[rng.integers(0, 4, L)].tobytes().decode()
        if with_invalid and L > 4 and rng.random() < 0.5:
            p = int(rng.integers(1, L - 1))
            seq = seq[:p] + rng.choice(["N", "x", "-"]) + seq[p:]
        out.append(f">r{i}\n{seq}\n")
    return "".join(out).encode()


def _numpy_index(db: SeqInfo, k: int = FIXED_K) -> KmerIndex:
    starts = valid_db_kmer_starts(db, k)
    keys = rolling_keys(db.codes, k)[starts] if len(starts) else np.empty(
        0, np.uint32
    )
    pos = (starts + k).astype(np.int32)
    sid = (np.searchsorted(db.start, starts, side="right") - 1).astype(
        np.int32
    )
    order = len(keys) - 1 - np.argsort(keys[::-1], kind="stable")
    return KmerIndex(
        keys=keys[order], pos=pos[order], sid=sid[order],
        db_total_len=db.total_len, db_n_seqs=db.n_seqs,
    )


def test_index_build_matches_numpy():
    data = synth_fasta(60, 80, seed=3, with_invalid=True)
    db = parse_fasta_bytes(data)
    ref = _numpy_index(db)
    got = build_index(db)
    np.testing.assert_array_equal(got.keys, ref.keys)
    np.testing.assert_array_equal(got.pos, ref.pos)
    np.testing.assert_array_equal(got.sid, ref.sid)
    np.testing.assert_array_equal(got.bucket_start, ref.bucket_start)


def test_index_build_empty_and_short():
    for body in (b">r0\n\n", b">r0\nACGT\n"):  # 0 and <k bases
        db = parse_fasta_bytes(body)
        idx = build_index(db)
        assert idx.n_entries == 0
        assert idx.bucket_start[-1] == 0


def test_kmer_stream_matches_numpy():
    rng = np.random.default_rng(7)
    db = parse_fasta_bytes(synth_fasta(40, 90, seed=5))
    idx = build_index(db)
    # query with ragged read lengths
    q = parse_fasta_bytes(synth_fasta(25, 70, seed=6, ragged=True))
    starts = q.start.astype(np.int64)
    n = q.n_seqs
    qlo = starts.copy()
    qlo[1:] = starts[1:] - 1
    qhi = np.empty(n, np.int64)
    qhi[:-1] = starts[1:] - 2
    qhi[-1] = q.total_len - 1
    n_kmers = np.maximum(0, qhi - FIXED_K + 1 - qlo + 1)
    K_off = np.zeros(n + 1, np.int64)
    K_off[1:] = n_kmers.cumsum()

    kp_n, lo_n, cnt_n, Ccum_n = native.kmer_stream_arrays(
        q.codes, qlo, n_kmers, FIXED_K, idx.bucket_start
    )

    total = int(K_off[-1])
    kp = (
        np.repeat(qlo, n_kmers)
        + np.arange(total, dtype=np.int64)
        - np.repeat(K_off[:-1], n_kmers)
    )
    keys = rolling_keys(q.codes)[kp]
    lo, hi = idx.lookup_ranges(keys)
    cnt = (hi - lo).astype(np.int64)
    Ccum = np.zeros(total + 1, np.int64)
    np.cumsum(cnt, out=Ccum[1:])

    np.testing.assert_array_equal(kp_n, kp)
    np.testing.assert_array_equal(lo_n, lo)
    np.testing.assert_array_equal(cnt_n, cnt)
    np.testing.assert_array_equal(Ccum_n, Ccum)

    # build_flat over random rank windows vs the numpy expansion
    C_off = Ccum[K_off]
    N_r = C_off[1:] - C_off[:-1]
    read_ids = np.flatnonzero(N_r > 0).astype(np.int64)
    from_rank = rng.integers(0, 3, len(read_ids)).astype(np.int64)
    to_rank = from_rank + rng.integers(0, 50, len(read_ids))
    out_size = int(
        np.maximum(0, np.minimum(to_rank, N_r[read_ids]) - from_rank).sum()
    )
    q_start = q.start.astype(np.int64)
    rids, hits, qoffs = native.build_flat_arrays(
        read_ids, from_rank, to_rank, K_off, C_off, kp, lo_n, cnt_n, Ccum,
        q_start, FIXED_K, out_size,
    )

    # reference expansion (python, per candidate)
    exp_r, exp_h, exp_q = [], [], []
    for e, r in enumerate(read_ids):
        rank = 0
        for t in range(K_off[r], K_off[r + 1]):
            for h in range(cnt[t]):
                if from_rank[e] <= rank < min(to_rank[e], N_r[r]):
                    exp_r.append(r)
                    exp_h.append(lo[t] + h)
                    exp_q.append(kp[t] + FIXED_K - q_start[r])
                rank += 1
    np.testing.assert_array_equal(rids, np.array(exp_r, np.int32))
    np.testing.assert_array_equal(hits, np.array(exp_h, np.int32))
    np.testing.assert_array_equal(qoffs, np.array(exp_q, np.int32))


@pytest.mark.skipif(
    native.lib is None, reason="native host library unavailable"
)
def test_native_packed_words_match_recompute():
    """The fill pass's (sid<<12|doff) words equal the vectorized
    recomputation from (pos, sid)."""
    import numpy as np

    from imsame_tpu.index.kmer import build_index
    from util_synth import make_pair
    import random, tempfile
    from pathlib import Path

    from imsame_tpu.io.fasta import read_fasta

    with tempfile.TemporaryDirectory() as td:
        rng = random.Random(17)
        _, dp = make_pair(Path(td), rng, n_query=5, n_db=60, read_len=180,
                          indel_rate=0.03)
        db = read_fasta(str(dp))
    idx = build_index(db)
    assert idx.packed is not None
    sid = np.asarray(idx.sid, np.int64)
    doff = np.asarray(idx.pos, np.int64) - db.start[sid]
    want = (sid.astype(np.uint32) << np.uint32(12)) | doff.astype(np.uint32)
    np.testing.assert_array_equal(idx.packed, want)


@pytest.mark.skipif(
    native.lib is None, reason="native host library unavailable"
)
def test_native_kmer_stream_threaded_large():
    """>2^18-slot input engages the pthread-split k-mer scan; it must be
    bit-equal to the numpy path (regression: the generic task runner once
    indexed the wrong struct size, leaving thread 1's range unwritten)."""
    import numpy as np

    from imsame_tpu.index.kmer import rolling_keys

    rng = np.random.default_rng(3)
    n_reads, L = 3000, 200  # 567k slots > 2^18 threshold
    codes = rng.integers(0, 4, n_reads * L, dtype=np.uint8)
    start = np.arange(n_reads, dtype=np.int64) * L
    qlo = start.copy()
    qlo[1:] = start[1:] - 1
    qhi = np.empty(n_reads, np.int64)
    qhi[:-1] = start[1:] - 2
    qhi[-1] = len(codes) - 1
    n_kmers = np.maximum(0, qhi - 12 + 1 - qlo + 1)
    nb = 4**12
    bucket_start = np.zeros(nb + 1, np.int32)
    keys = rng.integers(0, nb, 100000)
    bucket_start[1:] = np.cumsum(np.bincount(keys, minlength=nb)).astype(
        np.int32
    )
    kp, lo, cnt, Ccum = native.kmer_stream_arrays(
        codes, qlo, n_kmers, 12, bucket_start
    )
    total = int(n_kmers.sum())
    K_off = np.zeros(n_reads + 1, np.int64)
    K_off[1:] = n_kmers.cumsum()
    kp_ref = (
        np.repeat(qlo, n_kmers)
        + np.arange(total)
        - np.repeat(K_off[:-1], n_kmers)
    )
    ak = rolling_keys(codes)[kp_ref]
    lo_ref = bucket_start[ak]
    cnt_ref = (bucket_start[ak.astype(np.int64) + 1] - lo_ref).astype(np.int64)
    Ccum_ref = np.zeros(total + 1, np.int64)
    np.cumsum(cnt_ref, out=Ccum_ref[1:])
    np.testing.assert_array_equal(kp, kp_ref)
    np.testing.assert_array_equal(lo, lo_ref)
    np.testing.assert_array_equal(cnt, cnt_ref)
    np.testing.assert_array_equal(Ccum, Ccum_ref)


def test_native_seg_encode_matches_numpy():
    """host.c imsame_seg_encode == ops/candidates.encode_seg_chunk on a
    stream with read changes, qoff-delta overflows and resets."""
    from imsame_tpu import native
    from imsame_tpu.ops.candidates import encode_seg_chunk

    if native.lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    N = 5000
    rids = np.sort(rng.integers(0, 300, N)).astype(np.int32)
    qoffs = np.empty(N, np.int32)
    for r in np.unique(rids):
        m = rids == r
        qoffs[m] = np.sort(rng.integers(12, 4000, int(m.sum()))).astype(
            np.int32
        )
    hits = rng.integers(0, 1 << 24, N).astype(np.int32)
    size = 8192
    c_np, rt_np, rb_np = encode_seg_chunk(rids, qoffs, hits, size)
    out = native.seg_encode(rids, qoffs, hits, size, size // 2)
    assert out is not None
    cand, rt, rb, nseg = out
    assert nseg == len(rt_np)
    np.testing.assert_array_equal(cand, c_np)
    np.testing.assert_array_equal(rt[:nseg], rt_np)
    np.testing.assert_array_equal(rb[:nseg], rb_np)
    # overflow: cap below the segment count falls back
    assert native.seg_encode(rids, qoffs, hits, size, 2) is None
