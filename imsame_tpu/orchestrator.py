"""All-vs-all orchestration over N samples (replaces the reference bash
driver bin/all_vs_all_metagenomes_IMSAME.sh).

Per unordered sample pair (i < j) two comparisons run, exactly like the
reference: query=X vs db=Y (forward, "X-Y.align") and query=X vs
db=revcomp(Y) ("X-Y.r.align"; the reference revComp tool emits reads in
reverse file order, which changes read indices in the report -- preserved
by going through the same revcomp code path).  Resume is file-based like
the reference's existence check (sh:35,45) but crash-safe: reports are
written to a temp name and atomically renamed on completion.

Multi-host task parallelism: pass (host_id, n_hosts) to stripe the pair
list across hosts round-robin; each host only computes its own shard
(SURVEY.md section 2a "task parallelism over sample pairs").
"""

from __future__ import annotations

import collections
import dataclasses
import json
import os
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from .config import Config
from .index.kmer import build_index, load_index, save_index
from .io.fasta import (
    SeqInfo,
    parse_fasta_bytes,
    read_fasta,
    revcomp_fasta_bytes,
)
from .io.report import jaccard_index
from .pipeline import TpuEngine


@dataclasses.dataclass
class PairJob:
    qname: str
    dbname: str
    qpath: Path
    dbpath: Path
    reverse: bool  # db is reverse-complemented

    @property
    def out_name(self) -> str:
        suffix = ".r.align" if self.reverse else ".align"
        return f"{self.qname}-{self.dbname}{suffix}"


def list_samples(directory: str, ext: str) -> List[Tuple[str, Path]]:
    d = Path(directory)
    out = []
    for p in sorted(d.glob(f"*.{ext}")):
        out.append((p.name[: -(len(ext) + 1)], p))
    return out


def make_jobs(samples: List[Tuple[str, Path]]) -> List[PairJob]:
    jobs: List[PairJob] = []
    for i in range(len(samples)):
        for j in range(i, len(samples)):
            if i == j:
                continue
            (xn, xp), (yn, yp) = samples[i], samples[j]
            jobs.append(PairJob(xn, yn, xp, yp, reverse=False))
            jobs.append(PairJob(xn, yn, xp, yp, reverse=True))
    return jobs


class AllVsAllRunner:
    def __init__(
        self,
        outdir: str,
        cfg: Optional[Config] = None,
        host_id: int = 0,
        n_hosts: int = 1,
        max_engines: int = 2,
        max_queries: int = 4,
        index_cache: bool = True,
    ):
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg or Config()
        self.host_id = host_id
        self.n_hosts = n_hosts
        # Engines hold device-resident indexes (~8 B per db base): LRU-bound
        # so a 50-sample sweep (BASELINE config 5) never holds more than
        # max_engines samples' tables on device; jobs are grouped by
        # (db, reverse) below so eviction is rare.
        self.max_engines = max_engines
        self.max_queries = max_queries
        self.index_cache = index_cache
        self._engines: "collections.OrderedDict[Tuple[str, bool], TpuEngine]" = (
            collections.OrderedDict()
        )
        self._queries: "collections.OrderedDict[str, SeqInfo]" = (
            collections.OrderedDict()
        )
        self._save_threads: List[threading.Thread] = []
        self._prefetch: Optional[Tuple[Tuple[str, bool], object]] = None
        self._tmp_swept = False

    def _load_query(self, job: PairJob) -> SeqInfo:
        q = self._queries.get(job.qname)
        if q is None:
            # read_fasta streams >256 MB files in bounded memory
            q = read_fasta(str(job.qpath))
            self._queries[job.qname] = q
        self._queries.move_to_end(job.qname)
        while len(self._queries) > self.max_queries:
            self._queries.popitem(last=False)
        return q

    def _index_for(self, key: Tuple[str, bool], db: SeqInfo):
        """Per-sample persisted index (SURVEY.md 5.4): built once per
        (sample, strand) per sweep, reloaded on resume instead of rebuilt
        (the reference rebuilds from FASTA every run)."""
        if not self.index_cache:
            return None
        cache_dir = self.outdir / ".index"
        cache_dir.mkdir(exist_ok=True)
        if not self._tmp_swept:
            # a process killed mid-save leaves orphan {stem}.tmpXXXX.npz
            # files (never loaded; swept here on the next resumed sweep).
            # Only files older than an hour: another host sharing this
            # outdir may have an in-flight save on a younger tmp.
            self._tmp_swept = True
            cutoff = time.time() - 3600
            for orphan in cache_dir.glob("*.tmp*.npz"):
                try:
                    if orphan.stat().st_mtime < cutoff:
                        orphan.unlink()
                except OSError:
                    pass
        path = cache_dir / f"{key[0]}{'.r' if key[1] else ''}.npz"
        if path.exists():
            try:
                idx = load_index(str(path), db_start=db.start)
                if (
                    idx.db_total_len == db.total_len
                    and idx.db_n_seqs == db.n_seqs
                ):
                    return idx
            except Exception:
                pass  # corrupt/stale cache entry: rebuild below
        idx = build_index(db)
        # Cache write off the critical path: the save only pays off on a
        # RESUMED sweep, so it runs in a background thread (numpy I/O
        # releases the GIL); the atomic rename keeps partial writes
        # invisible to readers.
        # Unique per save: a rebuild after LRU eviction may overlap an
        # earlier save thread for the same key, and two writers on one tmp
        # path would rename a corrupt cache entry.
        fd, tmp = tempfile.mkstemp(
            prefix=path.stem + ".tmp", suffix=".npz", dir=cache_dir
        )
        os.close(fd)

        def _persist():
            try:
                save_index(idx, tmp)
                os.replace(tmp, path)
            except Exception:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                # cache miss next run; never fails the sweep

        t = threading.Thread(target=_persist, daemon=True)
        t.start()
        self._save_threads.append(t)
        return idx

    def _build_engine(self, job: PairJob) -> TpuEngine:
        """Parse (+revcomp) the db sample and build its engine.  Does NOT
        touch the LRU: safe to run on the prefetch thread while the main
        thread compares with the previous engine (parse/index build are
        native + numpy, the device uploads dispatch asynchronously)."""
        key = (job.dbname, job.reverse)
        if job.reverse:
            # revComp reverses file order (src/reverseComplement.c:56)
            # -- inherently two-pass, so it stays whole-file
            db = parse_fasta_bytes(
                revcomp_fasta_bytes(job.dbpath.read_bytes())
            )
        else:
            db = read_fasta(str(job.dbpath))
        return TpuEngine(db, self.cfg, index=self._index_for(key, db))

    def _engine_for(self, job: PairJob) -> TpuEngine:
        key = (job.dbname, job.reverse)
        eng = self._engines.get(key)
        if eng is None:
            pf = self._prefetch
            if pf is not None and pf[0] == key:
                self._prefetch = None
                eng = pf[1].result()  # built (or building) ahead of time
            else:
                eng = self._build_engine(job)
            self._engines[key] = eng
        self._engines.move_to_end(key)
        # The in-flight prefetch slot counts against the HBM bound: while
        # a prefetch engine is building off-LRU, evict down one extra so
        # resident device indexes never exceed max_engines (+1 transient
        # from an evicted engine kept alive by a pending render future).
        cap = self.max_engines - (1 if self._prefetch is not None else 0)
        while len(self._engines) > max(cap, 1):
            self._engines.popitem(last=False)
        return eng

    def run(self, samples: List[Tuple[str, Path]]) -> Dict[str, dict]:
        """Run all pair jobs assigned to this host; returns per-pair stats.

        Jobs whose output file already exists are skipped (resume).  This
        host's jobs are grouped by (db, reverse) so the LRU engine cache
        (device-resident index + packed rows) is reused across every pair
        sharing a database sample."""
        jobs = [
            job
            for k, job in enumerate(make_jobs(samples))
            if k % self.n_hosts == self.host_id
        ]
        jobs.sort(key=lambda j: (j.dbname, j.reverse))
        stats: Dict[str, dict] = {}
        failures: Dict[str, str] = {}

        def _finish(job, eng, q, res, t_compare, dev):
            """Render + atomic writes for one compared job.  Runs on the
            single worker thread so job N's report production (render-NW
            device pass, chain fetch, native block render, file IO)
            overlaps job N+1's compare; ``dev`` snapshots the compare's
            device state since a later compare on a shared engine
            overwrites eng._last_dev.  The recorded per-pair 'seconds' is
            compare wall + this job's own render wall (time queued behind
            the previous job's render is excluded, so entries stay
            comparable to the pre-overlap serial measurement)."""
            out_path = self.outdir / job.out_name
            stats_path = self.outdir / (job.out_name + ".json")
            t_r = time.perf_counter()
            report = eng.render_report(q, res, dev=dev)
            tmp = out_path.with_suffix(out_path.suffix + ".tmp")
            tmp.write_bytes(report)
            os.replace(tmp, out_path)  # atomic completion marker
            entry = {
                "query": job.qname,
                "db": job.dbname,
                "reverse": job.reverse,
                "accepted": res.accepted,
                "n_query": res.n_query,
                "n_db": res.n_db,
                "jaccard": jaccard_index(res.accepted, res.n_query, res.n_db),
                "seconds": t_compare + (time.perf_counter() - t_r),
                "nw_cells": res.nw_cells,
                "candidates": res.n_candidates,
            }
            tmp_s = stats_path.with_suffix(".json.tmp")
            tmp_s.write_text(json.dumps(entry))
            os.replace(tmp_s, stats_path)
            return entry

        pool = ThreadPoolExecutor(max_workers=1)
        prefetch_pool = ThreadPoolExecutor(max_workers=1)
        pending: List[Tuple[PairJob, object]] = []

        def _prefetch_next(i):
            """Kick off the next distinct engine's build so its parse /
            revcomp / index build / device uploads overlap the current
            job's compare."""
            key_now = (jobs[i].dbname, jobs[i].reverse)
            for nxt in jobs[i + 1 :]:
                if (self.outdir / nxt.out_name).exists():
                    continue  # resumed job: engine never needed
                key = (nxt.dbname, nxt.reverse)
                if key == key_now:
                    continue
                if key in self._engines or (
                    self._prefetch is not None and self._prefetch[0] == key
                ):
                    return
                self._prefetch = (
                    key, prefetch_pool.submit(self._build_engine, nxt)
                )
                return

        def _drain(block_all=False):
            """Collect finished render futures; keep at most one in
            flight (bounds queued chain memory to ~one job)."""
            while pending and (
                block_all or len(pending) > 1 or pending[0][1].done()
            ):
                pjob, fut = pending.pop(0)
                try:
                    stats[pjob.out_name] = fut.result()
                except Exception as e:
                    failures[pjob.out_name] = f"{type(e).__name__}: {e}"

        try:
            for i, job in enumerate(jobs):
                out_path = self.outdir / job.out_name
                stats_path = self.outdir / (job.out_name + ".json")
                if out_path.exists():
                    if stats_path.exists():
                        stats[job.out_name] = json.loads(
                            stats_path.read_text()
                        )
                    continue
                t0 = time.perf_counter()
                try:
                    q = self._load_query(job)
                    eng = self._engine_for(job)
                    _prefetch_next(i)
                    res = eng.compare(q)
                    dev = eng._last_dev
                    t_compare = time.perf_counter() - t0
                except Exception as e:  # failure isolation: one bad pair
                    # must not kill the sweep; the missing output file
                    # marks the job for retry on the next (resumed) run.
                    failures[job.out_name] = f"{type(e).__name__}: {e}"
                    continue
                pending.append(
                    (job,
                     pool.submit(_finish, job, eng, q, res, t_compare, dev))
                )
                _drain()
            _drain(block_all=True)
        finally:
            pool.shutdown(wait=True)
            prefetch_pool.shutdown(wait=True)
            self._prefetch = None
        if failures:
            fp = self.outdir / f"failures.host{self.host_id}.json"
            fp.write_text(json.dumps(failures, indent=1))
        self.failures = failures
        for t in self._save_threads:  # let cache writes land before exit
            t.join(timeout=60)
        self._save_threads.clear()
        return stats


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="imsame-tpu-all-vs-all",
        description="All-vs-all sample comparison "
        "(replaces all_vs_all_metagenomes_IMSAME.sh)",
    )
    p.add_argument("directory")
    p.add_argument("coverage", type=float)
    p.add_argument("similarity", type=float)
    p.add_argument("threads", type=int, help="accepted for CLI parity")
    p.add_argument("extension")
    p.add_argument("outpath")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--n-hosts", type=int, default=1)
    p.add_argument(
        "--distributed",
        action="store_true",
        help="initialize jax.distributed from IMSAME_COORDINATOR / "
        "IMSAME_NUM_PROCESSES / IMSAME_PROCESS_ID and derive the pair "
        "stripe from the process id (imsame_tpu/distributed.py)",
    )
    a = p.parse_args(argv)
    host_id, n_hosts = a.host_id, a.n_hosts
    ctx = None
    if a.distributed:
        from .distributed import init_distributed

        ctx = init_distributed()
        host_id, n_hosts = ctx.process_id, ctx.num_processes
    cfg = Config(min_coverage=a.coverage, min_identity=a.similarity)
    runner = AllVsAllRunner(a.outpath, cfg, host_id, n_hosts)
    stats = runner.run(list_samples(a.directory, a.extension))
    for name, s in sorted(stats.items()):
        print(f"{name}: accepted={s['accepted']} jaccard={s['jaccard']:.6e}")
    if ctx is not None and ctx.is_distributed:
        # Merge the sweep-level tally across processes (SURVEY.md 5.8:
        # psum of per-host accepted counts) -- every process prints the
        # same global number.
        from .distributed import allreduce_sum

        total = allreduce_sum(
            sum(s["accepted"] for s in stats.values()), ctx
        )
        print(
            f"[INFO] Distributed sweep total accepted reads: {total} "
            f"({ctx.num_processes} processes)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
