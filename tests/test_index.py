"""K-mer index: set equality and per-bucket order vs a brute-force model of
the reference's prepend-on-insert linked lists (src/IMSAME.c:232-281)."""

import random

import numpy as np

from imsame_tpu.constants import FIXED_K
from imsame_tpu.index.kmer import build_index, pack_kmers, rolling_keys
from imsame_tpu.io.fasta import parse_fasta_bytes


def brute_force_buckets(si):
    """Simulate the reference build: per-read sliding window with resets,
    prepend to bucket."""
    buckets = {}
    n = si.n_seqs
    for r in range(n):
        s = int(si.start[r])
        e = int(si.start[r + 1]) if r + 1 < n else si.total_len
        run_start = s
        for p in range(s, e):
            if si.fresh[p] and p > s:
                run_start = p
            if p - run_start + 1 >= FIXED_K:
                kstart = p - FIXED_K + 1
                key = 0
                for i in range(FIXED_K):
                    key = (key << 2) | int(si.codes[kstart + i])
                buckets.setdefault(key, []).insert(0, (p + 1, r))  # prepend
    return buckets


def test_index_matches_bruteforce():
    rng = random.Random(11)
    reads = []
    for _ in range(30):
        L = rng.randrange(5, 60)
        reads.append(
            "".join(rng.choice("ACGTACGTN") for _ in range(L))
        )
    data = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    si = parse_fasta_bytes(data)
    idx = build_index(si)
    bf = brute_force_buckets(si)

    assert idx.n_entries == sum(len(v) for v in bf.values())
    for key, entries in bf.items():
        lo, hi = idx.lookup_range(key)
        got = list(zip(idx.pos[lo:hi].tolist(), idx.sid[lo:hi].tolist()))
        assert got == entries, f"bucket {key} mismatch"


def test_pack_and_rolling_agree():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=200).astype(np.uint8)
    starts = np.arange(0, 189, dtype=np.int64)
    np.testing.assert_array_equal(pack_kmers(codes, starts), rolling_keys(codes))


def test_repeated_kmer_order_is_pos_descending():
    # Same k-mer many times across reads: bucket order must be newest-first.
    data = b">a\n" + b"ACGTACGTACGT" * 3 + b"\n>b\n" + b"ACGTACGTACGT" * 2 + b"\n"
    si = parse_fasta_bytes(data)
    idx = build_index(si)
    key = int(pack_kmers(si.codes, np.array([0], dtype=np.int64))[0])
    lo, hi = idx.lookup_range(key)
    pos = idx.pos[lo:hi]
    assert np.all(np.diff(pos) < 0)


def test_index_save_load(tmp_path):
    import random
    from imsame_tpu.index.kmer import load_index, save_index

    rng = random.Random(5)
    reads = ["".join(rng.choice("ACGT") for _ in range(40)) for _ in range(10)]
    data = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    si = parse_fasta_bytes(data)
    idx = build_index(si)
    p = tmp_path / "idx.npz"
    save_index(idx, str(p))
    idx2 = load_index(str(p), db_start=si.start)
    np.testing.assert_array_equal(idx.keys, idx2.keys)
    np.testing.assert_array_equal(idx.pos, idx2.pos)
    np.testing.assert_array_equal(idx.sid, idx2.sid)
    assert idx.db_total_len == idx2.db_total_len
    assert idx.db_n_seqs == idx2.db_n_seqs
