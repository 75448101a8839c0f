"""Batched single-host engine: seed scan -> extension gate -> NW resolve.

Replaces the reference's per-thread sequential scan
(src/alignmentFunctions.c:43-208) with batched device stages while keeping
its acceptance semantics bit-exact:

  * Each query read has a totally ordered candidate stream: k-mer start
    positions in scan order (including the boundary-base quirk, SURVEY.md
    6.5) x bucket hits in descending database position (6.1).
  * The reference walks that stream sequentially, runs the gapped aligner
    on every e-value-passing hit, and the first *accepting* pair wins the
    read ("NWaligned", 6.8).  The winner only depends on the (query read,
    db read) pair -- the aligner sees full reads -- so acceptance can be
    evaluated out of order and the winner recovered as the first candidate
    whose pair accepts.  We therefore:
      1. gate candidates in windowed batches on device (ops/extend.py),
      2. walk passing candidates *in stream order* per read, batching the
         gapped alignments of first-unknown pairs across reads
         (ops/nw.py + ops/traceback.py), caching rejected pairs,
      3. stop each read at its first accepting candidate.

This yields identical accepted pairs and, with the shared renderer, a
byte-identical report to the reference binary at n_threads=1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .constants import FIXED_K, MAX_READ_SIZE
from .index.kmer import KmerIndex, build_index, rolling_keys
from .io.fasta import CODE_TO_CHAR, SeqInfo
from .io.reconstruct import backtrack_from_chain
from .io.report import format_record, render_alignment
from .ops.candidates import RoundTables, candidate_round
from .ops.extend import raw_score_threshold
from .ops.nw import nw_forward_batch
from .ops.nw_pallas import nw_forward_batch_pallas
from .ops.traceback import traceback_batch
from .utils.timing import PhaseTimer


@dataclasses.dataclass
class AcceptedRead:
    qread: int
    dbread: int
    length: int
    identities: int
    ylen: int
    n_steps: int
    # Traceback chain: left on device until a report is rendered (the
    # engine may sit behind a slow link; stats-only runs never fetch it).
    chain_dev: object = None  # jax.Array [B, 2L] holding the whole chunk
    chain_row: int = -1
    chain: Optional[np.ndarray] = None  # filled by _materialize_chains


@dataclasses.dataclass
class PipelineResult:
    accepted: int
    n_query: int
    n_db: int
    pairs: List[Tuple[int, int]]
    records: List[AcceptedRead]
    timings: Dict[str, float]
    nw_cells: int  # DP cells computed (for GCUPS accounting)
    n_candidates: int  # extension candidates evaluated

    @property
    def jaccard(self) -> float:
        return self.accepted / ((self.n_db + self.n_query) - self.accepted)


def _pow2_pad(n: int, cap: int) -> int:
    """Smallest power of two >= n, capped; keeps jit shape cache small."""
    p = 8
    while p < n and p < cap:
        p *= 2
    return min(p, cap) if n <= cap else cap


def _read_bounds_ext(si: SeqInfo) -> Tuple[np.ndarray, np.ndarray]:
    """Per-read extension bounds with the reference's last-read asymmetry
    (src/alignmentFunctions.c:280-294): end bound is the last base index for
    all reads except the last, where it is total_len."""
    n = si.n_seqs
    starts = si.start.astype(np.int64)
    ends = np.empty(n, np.int64)
    if n > 1:
        ends[:-1] = starts[1:] - 1
    if n > 0:
        ends[-1] = si.total_len
    return starts, ends


class TpuEngine:
    """Compare query samples against one database sample on device."""

    def __init__(self, db: SeqInfo, cfg: Optional[Config] = None):
        self.db = db
        self.cfg = cfg or Config()
        self.cfg.validate()
        self.timer = PhaseTimer()
        with self.timer.phase("index_build"):
            self.index: KmerIndex = build_index(db)
        # Device-resident database state.
        self.d_db_codes = jnp.asarray(db.codes)
        self.d_idx_keys = jnp.asarray(self.index.keys)
        self.dxs, self.dxe = _read_bounds_ext(db)
        self.db_read_lens = db.read_lens()
        self._nw_cells = 0
        self._n_cands = 0
        use_pallas = self.cfg.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self._use_pallas = use_pallas

    # ------------------------------------------------------------------
    def _kmer_stream(self, q: SeqInfo):
        """Per-read candidate stream tables (host, vectorized).

        Returns (kp, K_off, lo, cnt, Ccum, C_off):
          kp[i]    k-mer start position of global k-mer slot i (stream order)
          K_off[r] first k-mer slot of read r (K_off[n] = total slots)
          lo[i]    index bucket start for slot i
          cnt[i]   bucket size for slot i
          Ccum[i]  exclusive cumsum of cnt (global candidate offsets)
          C_off[r] first global candidate rank boundary per read
        """
        n = q.n_seqs
        starts = q.start.astype(np.int64)
        total = q.total_len
        # Stream bounds with the boundary-base quirk; thread-split firsts
        # lose the previous read's trailing base (reference worker init).
        qlo = starts.copy()
        if n > 0:
            qlo[1:] = starts[1:] - 1
            n_threads = self.cfg.n_threads
            if n_threads > 1:
                rpt = n // n_threads
                tstarts = np.array(
                    [t * rpt for t in range(n_threads)], dtype=np.int64
                )
                tstarts = tstarts[tstarts < n]
                qlo[tstarts] = starts[tstarts]
        qhi = np.empty(n, np.int64)
        if n > 1:
            qhi[:-1] = starts[1:] - 2
        if n > 0:
            qhi[-1] = total - 1

        n_kmers = np.maximum(0, qhi - FIXED_K + 1 - qlo + 1)  # [n]
        K_off = np.zeros(n + 1, np.int64)
        np.cumsum(n_kmers, out=K_off[1:])
        total_kmers = int(K_off[-1])

        # k-mer start positions, contiguous per read (vectorized repeat).
        kp = (
            np.repeat(qlo, n_kmers)
            + np.arange(total_kmers, dtype=np.int64)
            - np.repeat(K_off[:-1], n_kmers)
        )

        # keys + bucket ranges in one vectorized pass
        all_keys = rolling_keys(q.codes)  # key at every concat position
        keys = all_keys[kp] if total_kmers else np.empty(0, np.uint32)
        lo = np.searchsorted(self.index.keys, keys, side="left")
        hi = np.searchsorted(self.index.keys, keys, side="right")
        cnt = (hi - lo).astype(np.int64)
        Ccum = np.zeros(total_kmers + 1, np.int64)
        np.cumsum(cnt, out=Ccum[1:])
        C_off = Ccum[K_off]
        return kp, K_off, lo, cnt, Ccum, C_off

    # ------------------------------------------------------------------
    def _nw_bucket(self, L: int):
        for b in self.cfg.length_buckets:
            if L <= b:
                return b
        raise ValueError("Read size reached for gapped alignment.")

    def _run_nw_batch(
        self,
        q: SeqInfo,
        pairs: List[Tuple[int, int]],  # (qread, dbread)
        q_codes_dev: jax.Array,
    ) -> List[Tuple[int, int, int, np.ndarray, int]]:
        """Gapped-align pairs; returns (length, identities, ylen, chain,
        n_steps) per pair, grouped transparently by length bucket.  All
        chunks are dispatched asynchronously before any result is awaited,
        so one round pays a single device round-trip."""
        db = self.db
        out: List = [None] * len(pairs)
        by_bucket: Dict[int, List[int]] = {}
        for i, (r, s) in enumerate(pairs):
            xlen = int(self.db_read_lens[s])
            ylen = q.read_len(r)
            if xlen > MAX_READ_SIZE or ylen > MAX_READ_SIZE:
                raise ValueError("Read size reached for gapped alignment.")
            by_bucket.setdefault(self._nw_bucket(max(xlen, ylen)), []).append(i)

        nw_fn = nw_forward_batch_pallas if self._use_pallas else nw_forward_batch
        pending = []  # (chunk, yl, traceback result) with results in flight
        for L, idxs in by_bucket.items():
            for c0 in range(0, len(idxs), self.cfg.nw_batch):
                chunk = idxs[c0 : c0 + self.cfg.nw_batch]
                B = _pow2_pad(len(chunk), self.cfg.nw_batch)
                Xb = np.zeros((B, L), np.uint8)
                Yb = np.ones((B, L), np.uint8)  # padded pairs never accepted
                xl = np.full(B, 2, np.int32)
                yl = np.full(B, 2, np.int32)
                for b, i in enumerate(chunk):
                    r, s = pairs[i]
                    xs = int(db.start[s])
                    xe = db.read_end(s)
                    ys = int(q.start[r])
                    ye = q.read_end(r)
                    Xb[b, : xe - xs] = db.codes[xs:xe]
                    Yb[b, : ye - ys] = q.codes[ys:ye]
                    xl[b] = xe - xs
                    yl[b] = ye - ys
                self._nw_cells += int(
                    np.sum(xl[: len(chunk)].astype(np.int64) * yl[: len(chunk)])
                )
                Xd = jnp.asarray(Xb)
                Yd = jnp.asarray(Yb)
                res = nw_fn(
                    Xd, Yd, jnp.asarray(xl), jnp.asarray(yl),
                    self.cfg.igap, self.cfg.egap, max_len=L,
                )
                tb = traceback_batch(
                    res.bp, res.best_i, res.best_j, Xd, Yd, max_len=L
                )
                pending.append((chunk, yl, tb))

        for chunk, yl, tb in pending:
            lengths = np.asarray(tb.length)
            idents = np.asarray(tb.identities)
            nsteps = np.asarray(tb.n_steps)
            for b, i in enumerate(chunk):
                out[i] = (
                    int(lengths[b]),
                    int(idents[b]),
                    int(yl[b]),
                    tb.chain,  # device buffer, fetched lazily
                    b,
                    int(nsteps[b]),
                )
        return out

    # ------------------------------------------------------------------
    def compare(self, q: SeqInfo) -> PipelineResult:
        cfg = self.cfg
        db = self.db
        idx = self.index
        self._nw_cells = 0
        self._n_cands = 0

        with self.timer.phase("kmer_stream"):
            kp, K_off, lo, cnt, Ccum, C_off = self._kmer_stream(q)
        n = q.n_seqs
        N_r = (C_off[1:] - C_off[:-1]) if n else np.empty(0, np.int64)

        q_codes_dev = jnp.asarray(q.codes)
        qlens = q.read_lens() if n else np.empty(0, np.int64)
        thr = raw_score_threshold(qlens, db.total_len, cfg.min_e_value)
        qys, qye = _read_bounds_ext(q)

        # static extension window: longest read in either sample, padded
        max_rl = 1
        if n:
            max_rl = max(max_rl, int(qlens.max()))
        if db.n_seqs:
            max_rl = max(max_rl, int(self.db_read_lens.max()))
        window = self._nw_bucket(max_rl)

        resolved = np.zeros(n, bool)
        next_g = np.zeros(n, np.int64)
        rejected: Dict[int, Set[int]] = {}
        accepted_records: List[AcceptedRead] = []

        R = cfg.cands_per_round

        # Device-resident round tables (one upload per compare).
        if idx.n_entries == 0 or Ccum[-1] == 0 or n == 0:
            tables = None
        else:
            i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
            cnt_k = (Ccum[1:] - Ccum[:-1]).astype(np.int64)
            t_of_gc = np.repeat(
                np.arange(len(cnt_k), dtype=np.int32), cnt_k
            )
            tables = RoundTables(
                Ccum=i32(Ccum),
                t_of_gc=i32(t_of_gc),
                lo=i32(lo),
                kp=i32(kp),
                C_off=i32(C_off[:n]),
                N_r=i32(N_r),
                idx_pos=i32(idx.pos),
                idx_sid=i32(idx.sid),
                dxs=i32(self.dxs),
                dxe=i32(self.dxe),
                qys=i32(qys),
                qye=i32(qye),
                thr=jnp.asarray(thr),
                db_codes=self.d_db_codes,
                q_codes=q_codes_dev,
            )

        with self.timer.phase("resolve"):
            while tables is not None:
                active = np.flatnonzero(~resolved & (next_g < N_r))
                if len(active) == 0:
                    break
                A = len(active)
                # Pad the active-read axis to a power of two for stable jit
                # shapes; padded rows duplicate read 0 and are masked out.
                A_pad = _pow2_pad(A, max(8, cfg.read_batch))
                if A > A_pad:
                    active = active[:A_pad]
                    A = A_pad
                pad_rows = A_pad - A
                act = np.concatenate([active, np.zeros(pad_rows, np.int64)])
                row_valid = np.zeros(A_pad, bool)
                row_valid[:A] = True

                self._n_cands += int(
                    np.minimum(
                        np.maximum(N_r[act[:A]] - next_g[act[:A]], 0), R
                    ).sum()
                )
                with self.timer.phase("resolve.extend"):
                    rr = candidate_round(
                        tables,
                        jnp.asarray(act.astype(np.int32)),
                        jnp.asarray(next_g[act].astype(np.int32)),
                        jnp.asarray(row_valid),
                        R=R,
                        window=window,
                    )
                    # ascontiguousarray: device arrays can come back with
                    # padded strides (TPU layouts); .view() needs contiguity.
                    pb = np.ascontiguousarray(
                        np.asarray(rr.pass_bits), dtype="<u4"
                    )
                    passes = (
                        np.unpackbits(
                            pb.view(np.uint8).reshape(A_pad, -1),
                            axis=1,
                            bitorder="little",
                        )[:, :R]
                        .astype(bool)
                    )

                def sid_of(read: int, slot: int) -> int:
                    gc = int(next_g[read]) + slot + int(C_off[read])
                    t = int(t_of_gc[gc])
                    return int(idx.sid[lo[t] + gc - Ccum[t]])

                # Walk passing candidates in stream order per read, batching
                # unknown pairs across reads.  The first-passing-slot search
                # is vectorized; Python only touches rows that actually have
                # a passing candidate (and the rare rejected-pair reruns).
                cursor = np.zeros(A, np.int64)  # next window slot to inspect
                undecided = np.ones(A, bool)
                slots = np.arange(R)[None, :]
                pA = passes[:A]
                while True:
                    nw_pairs: List[Tuple[int, int]] = []
                    nw_owner: List[int] = []
                    mask = pA & (slots >= cursor[:, None])
                    mask[~undecided] = False
                    has = mask.any(axis=1)
                    first = mask.argmax(axis=1)
                    undecided &= has
                    for a in np.flatnonzero(undecided):
                        r = int(active[a])
                        rej = rejected.get(r)
                        m = int(first[a])
                        chosen = -1
                        while m < R:
                            if pA[a, m]:
                                s = sid_of(r, m)
                                if rej is None or s not in rej:
                                    chosen = m
                                    break
                            m += 1
                        if chosen < 0:
                            undecided[a] = False
                        else:
                            cursor[a] = chosen
                            nw_pairs.append((r, sid_of(r, chosen)))
                            nw_owner.append(a)
                    if not nw_pairs:
                        break
                    with self.timer.phase("resolve.nw"):
                        results = self._run_nw_batch(q, nw_pairs, q_codes_dev)
                    for (r, s), a, (length, idents, ylen, cdev, crow, nst) in zip(
                        nw_pairs, nw_owner, results
                    ):
                        if (
                            length / ylen >= cfg.min_coverage
                            and idents / length >= cfg.min_identity
                        ):
                            resolved[r] = True
                            undecided[a] = False
                            accepted_records.append(
                                AcceptedRead(
                                    r, s, length, idents, ylen, nst,
                                    chain_dev=cdev, chain_row=crow,
                                )
                            )
                        else:
                            rejected.setdefault(r, set()).add(s)
                            cursor[a] += 1
                next_g[active] += R

        with self.timer.phase("render"):
            accepted_records.sort(key=lambda a: a.qread)

        return PipelineResult(
            accepted=len(accepted_records),
            n_query=n,
            n_db=db.n_seqs,
            pairs=[(a.qread, a.dbread) for a in accepted_records],
            records=accepted_records,
            timings=dict(self.timer.items()),
            nw_cells=self._nw_cells,
            n_candidates=self._n_cands,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _materialize_chains(records: List[AcceptedRead]) -> None:
        """Fetch traceback chains from device, batched per chunk buffer
        (one gather + one transfer per NW chunk that produced accepts)."""
        by_buf: Dict[int, Tuple[object, List[AcceptedRead]]] = {}
        for rec in records:
            if rec.chain is not None or rec.chain_dev is None:
                continue
            key = id(rec.chain_dev)
            by_buf.setdefault(key, (rec.chain_dev, []))[1].append(rec)
        for buf, recs in by_buf.values():
            rows = jnp.asarray(
                np.array([r.chain_row for r in recs], np.int32)
            )
            fetched = np.asarray(buf[rows])
            for k, rec in enumerate(recs):
                rec.chain = fetched[k]

    def render_report(self, q: SeqInfo, result: PipelineResult) -> bytes:
        """Byte-identical -out file content (records in read order, matching
        the reference at n_threads=1)."""
        self._materialize_chains(result.records)
        db = self.db
        out = bytearray()
        for a in result.records:
            xs = int(db.start[a.dbread])
            xe = db.read_end(a.dbread)
            ys = int(q.start[a.qread])
            ye = q.read_end(a.qread)
            x_chars = CODE_TO_CHAR[db.codes[xs:xe]]
            y_chars = CODE_TO_CHAR[q.codes[ys:ye]]
            rec_x, rec_y, hx, hy, ml = backtrack_from_chain(
                a.chain, a.n_steps, xe - xs, ye - ys, x_chars, y_chars
            )
            block, identities = render_alignment(rec_x, rec_y, hx, hy, ml)
            assert identities == a.identities  # traceback/render agreement
            out.extend(
                format_record(
                    a.qread, a.dbread, identities, a.length, a.ylen, block
                )
            )
        return bytes(out)
