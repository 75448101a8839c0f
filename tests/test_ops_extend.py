"""Batched ungapped extension vs the faithful scalar oracle, over real
k-mer hits from synthetic read sets."""

import math
import random

import jax.numpy as jnp
import numpy as np
import pytest

from imsame_tpu.constants import FIXED_K, QF_KARLIN, QF_LAMBDA
from imsame_tpu.index.kmer import build_index, pack_kmers
from imsame_tpu.io.fasta import parse_fasta_bytes
from imsame_tpu.oracle.extend import extend_hit
from imsame_tpu.ops.extend import extend_batch, raw_score_threshold
from util_synth import make_pair, mutate, random_read


def _mk_seqinfos(rng, n=20, L=80, sub=0.08, indel=0.05):
    q = [random_read(rng, L) for _ in range(n)]
    db = [mutate(rng, r, sub, indel) for r in q[: n // 2]]
    db += [random_read(rng, L) for _ in range(n - n // 2)]
    qd = "".join(f">q{i}\n{r}\n" for i, r in enumerate(q)).encode()
    dd = "".join(f">d{i}\n{r}\n" for i, r in enumerate(db)).encode()
    return parse_fasta_bytes(qd), parse_fasta_bytes(dd)


def _bounds(si, r):
    """Reference extension bounds (src/alignmentFunctions.c:280-294)."""
    if r == si.n_seqs - 1:
        return int(si.start[r]), si.total_len
    return int(si.start[r]), int(si.start[r + 1]) - 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_extension_matches_oracle(seed):
    rng = random.Random(seed)
    qi, di = _mk_seqinfos(rng)
    idx = build_index(di)

    # enumerate genuine hits: every query k-mer (within reads) x bucket
    cands = []
    for r in range(qi.n_seqs):
        s, e = int(qi.start[r]), qi.read_end(r)
        for p in range(s, e - FIXED_K + 1):
            key = int(pack_kmers(qi.codes, np.array([p], dtype=np.int64))[0])
            lo, hi = idx.lookup_range(key)
            for h in range(lo, hi):
                cands.append((int(idx.pos[h]), p + FIXED_K, r, int(idx.sid[h])))
    rng.shuffle(cands)
    cands = cands[:400]
    assert len(cands) > 50

    N = len(cands)
    pos_db = np.array([c[0] for c in cands], np.int32)
    pos_q = np.array([c[1] for c in cands], np.int32)
    reads = np.array([c[2] for c in cands], np.int64)
    sids = np.array([c[3] for c in cands], np.int64)
    rxs = np.array([_bounds(di, s)[0] for s in sids], np.int32)
    rxe = np.array([_bounds(di, s)[1] for s in sids], np.int32)
    rys = np.array([_bounds(qi, r)[0] for r in reads], np.int32)
    rye = np.array([_bounds(qi, r)[1] for r in reads], np.int32)

    min_e = 1e-20
    qlens = qi.read_lens()
    thr = raw_score_threshold(qlens, di.total_len, min_e)
    raw_min = thr[reads]

    res = extend_batch(
        jnp.asarray(di.codes),
        jnp.asarray(qi.codes),
        jnp.asarray(pos_db),
        jnp.asarray(pos_q),
        jnp.asarray(rxs),
        jnp.asarray(rxe),
        jnp.asarray(rys),
        jnp.asarray(rye),
        jnp.asarray(raw_min),
        window=128,
    )
    raws = np.asarray(res.raw)
    passes = np.asarray(res.passes)
    tlens = np.asarray(res.t_len)
    idents_arr = np.asarray(res.idents)

    for n in range(N):
        qf = extend_hit(di, qi, int(pos_db[n]), int(pos_q[n]), int(reads[n]), int(sids[n]))
        # recompute oracle raw/idents from its outputs
        want_pass = qf.e_value < min_e
        assert passes[n] == want_pass, f"cand {n} gate"
        assert tlens[n] == qf.t_len, f"cand {n} t_len"
        # cross-check raw vs e-value relation
        qlen = float(qlens[int(reads[n])])
        if qlen > 0:
            e = QF_KARLIN * qlen * di.total_len * math.exp(
                max(-700.0, -QF_LAMBDA * float(raws[n]))
            )
            assert math.isclose(e, qf.e_value, rel_tol=1e-9) or (
                e < 1e-280 and qf.e_value < 1e-280
            ), f"cand {n} evalue"


def test_threshold_endpoints():
    thr = raw_score_threshold(np.array([0, 100]), 10000, 1e-20)
    assert thr[0] == np.iinfo(np.int32).min  # empty read always passes
    t = (math.log(QF_KARLIN * 100 * 10000) - math.log(1e-20)) / QF_LAMBDA
    assert thr[1] == math.floor(t) + 1
    thr0 = raw_score_threshold(np.array([100]), 10000, 0.0)
    assert thr0[0] == np.iinfo(np.int32).max  # min_e == 0 never passes


def test_raw_score_threshold_longdouble_exact():
    """The integer threshold is the exact smallest raw score whose
    long-double e-value (the reference's expression and types,
    src/alignmentFunctions.c:384) is strictly below min_e_value --
    verified by brute-force longdouble scan around the boundary."""
    import numpy as np

    from imsame_tpu.constants import QF_KARLIN, QF_LAMBDA
    from imsame_tpu.ops.extend import raw_score_threshold

    assert np.finfo(np.longdouble).machep <= -63, "x86-64 80-bit expected"
    rng = np.random.default_rng(11)
    qlens = rng.integers(50, 3000, 64).astype(np.int64)
    dlen = int(rng.integers(10**5, 10**8))
    for e0 in (1e-20, 1e-10, 1e-40, 0.001, 1.0):
        thr = raw_score_threshold(qlens, dlen, e0)
        lam = np.longdouble(np.float64(QF_LAMBDA))
        kar = np.longdouble(np.float64(QF_KARLIN))
        e0l = np.longdouble(np.float64(e0))
        for q, t in zip(qlens, thr):
            base = kar * np.longdouble(q) * np.longdouble(dlen)
            E = lambda raw: base * np.exp(-lam * np.longdouble(raw))
            assert E(t) < e0l, f"threshold {t} does not pass (q={q}, e0={e0})"
            assert not (E(t - 1) < e0l), (
                f"threshold {t} not minimal (q={q}, e0={e0})"
            )
