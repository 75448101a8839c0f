"""Benchmark: alignment-phase throughput on the BASELINE.md workload.

Workload (mirrors the measured reference baseline): 20k query reads x 20k
database reads, 250 bp, 50% of db reads are ~4%-mutated copies of query
reads, default thresholds.  The reference C binary sustains ~2.7k query
reads/s on this workload (BASELINE.md); vs_baseline is reads/s divided by
that.

Prints the FULL payload JSON line first, then a COMPACT summary JSON line
LAST (the driver archives a bounded tail of stdout, so every headline
number -- reads/s, kernel GCUPS, sweep, 100k block, long-read block,
parity -- must fit in the final line):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Set IMSAME_BENCH_READS to scale the workload (default 20000).
Set IMSAME_BENCH_PARITY=1 to additionally run the compiled reference binary
on the same workload (written out as FASTA) and byte-compare the reports --
the SURVEY.md section 4.1 check at bench scale; adds "parity" to the JSON.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_S = 2700.0


def synth_pair(n: int, read_len: int, match_frac: float, seed: int):
    """Synthetic query/db code batches (uint8 0..3), BASELINE workload."""
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, (n, read_len), dtype=np.uint8)
    nm = int(n * match_frac)
    db = q[:nm].copy()
    mask = rng.random((nm, read_len)) < 0.04
    db[mask] = (db[mask] + rng.integers(1, 4, int(mask.sum()), dtype=np.uint8)) % 4
    db = np.concatenate(
        [db, rng.integers(0, 4, (n - nm, read_len), dtype=np.uint8)]
    )
    perm = rng.permutation(n)
    return q, db[perm]


def codes_to_seqinfo(reads: np.ndarray):
    from imsame_tpu.io.fasta import SeqInfo

    n, L = reads.shape
    codes = reads.reshape(-1).copy()
    start = (np.arange(n, dtype=np.int64) * L)
    fresh = np.zeros(n * L, bool)
    fresh[start] = True
    return SeqInfo(codes=codes, start=start, fresh=fresh, headers=[b""] * n)


def check_parity(eng, q, res, qc, dbc) -> str:
    """Write the bench workload as FASTA, run the compiled reference binary
    on it, and byte-compare reports (n_threads=1 on both sides, so record
    order is deterministic).  Returns 'byte-identical' or raises."""
    import sys as _sys
    import tempfile
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from util_synth import (
        parse_reference_summary,
        reference_binaries,
        run_reference,
    )

    ref = reference_binaries()
    if ref is None:
        return "reference unavailable"
    chars = np.frombuffer(b"ACGT", np.uint8)
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        for name, mat in (("q.fa", qc), ("db.fa", dbc)):
            with open(td / name, "wb") as f:
                for i in range(mat.shape[0]):
                    f.write(b">r%d\n" % i)
                    f.write(chars[mat[i]].tobytes())
                    f.write(b"\n")
        ref_out = td / "ref.align"
        stdout = run_reference(
            ref[0], td / "q.fa", td / "db.fa", ref_out, n_threads=1
        )
        accepted_ref, _, _ = parse_reference_summary(stdout)
        assert res.accepted == accepted_ref, (
            f"accepted mismatch: engine {res.accepted} vs "
            f"reference {accepted_ref}"
        )
        report = eng.render_report(q, res)
        assert report == ref_out.read_bytes(), "report bytes differ"
    return "byte-identical"


def sweep_bench(base: np.ndarray) -> dict:
    """All-vs-all sample-pairs/hour (the reference driver's unit of work:
    one unordered sample pair = forward + revcomp runs,
    bin/all_vs_all_metagenomes_IMSAME.sh:27-58).  Four 20k-read samples
    sharing ~half their content run through the production orchestrator
    (engine LRU + per-sample index cache + report rendering); read
    shapes match the warmed compare, so this measures steady-state
    sweep throughput, not compiles."""
    import tempfile
    from pathlib import Path

    from imsame_tpu.orchestrator import AllVsAllRunner, list_samples

    chars = np.frombuffer(b"ACGT", np.uint8)
    rng = np.random.default_rng(777)
    n, L = base.shape
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        sdir = td / "samples"
        sdir.mkdir()
        for s in range(4):
            if s == 0:
                mat = base
            else:
                nm = n // 2
                mut = base[:nm].copy()
                mask = rng.random(mut.shape) < 0.04
                mut[mask] = (
                    mut[mask]
                    + rng.integers(1, 4, int(mask.sum()), dtype=np.uint8)
                ) % 4
                mat = np.concatenate(
                    [mut, rng.integers(0, 4, (n - nm, L), dtype=np.uint8)]
                )
                mat = mat[rng.permutation(n)]
            with open(sdir / f"s{s}.fasta", "wb") as f:
                for i in range(n):
                    f.write(b">r%d\n" % i)
                    f.write(chars[mat[i]].tobytes())
                    f.write(b"\n")
        samples = list_samples(str(sdir), "fasta")
        # best-of-2 full passes (independent runners/outdirs, engines and
        # index caches cold each pass): the tunnel's minute-scale 3x
        # bandwidth swings otherwise dominate a single ~30 s measurement
        walls = []
        n_jobs = 0
        for p in range(int(os.environ.get("IMSAME_BENCH_SWEEP_RUNS", "2"))):
            runner = AllVsAllRunner(str(td / f"out{p}"))
            t0 = time.perf_counter()
            stats = runner.run(samples)
            walls.append(round(time.perf_counter() - t0, 2))
            n_jobs = len(stats)
        dt = min(walls)
        n_pairs = len(samples) * (len(samples) - 1) // 2
        return {
            "metric": "all-vs-all sample pairs/hour "
            "(4 x 20k-read samples, fwd+rev, reports written)",
            "pairs": n_pairs,
            "jobs": n_jobs,
            "wall_seconds": dt,
            "wall_seconds_runs": walls,
            "pairs_per_hour": round(3600.0 * n_pairs / dt, 1),
        }


def nw_kernel_gcups(eng, n_reads: int) -> float:
    """Dedicated stats-KERNEL throughput (GCUPS over real cells), timed
    with a host fetch as the sync (block_until_ready does not block on
    the axon backend).  Times the wavefront kernel itself on resident
    unpacked code matrices -- the production row-gather/unpack prologue
    is part of resolve.nw, not of the kernel (the pipeline's resolve.nw
    wall in turn overlaps gate fetches, so it under-reports both)."""
    import jax
    import jax.numpy as jnp

    import functools

    from imsame_tpu.ops.nw_pallas import nw_stats_batch_pallas_pipe4
    from imsame_tpu.ops.nw import nw_stats_batch
    from imsame_tpu.ops.resolve import PIPE4_VARIANTS, unpack_rows

    d_qp, d_dp, d_qlen, d_dlen = eng._last_dev
    rng = np.random.default_rng(9)
    # B sized so one kernel invocation's wall (~50 ms) dominates the
    # per-dispatch tunnel RPC spacing (up to ~25 ms in slow windows --
    # with small B the device drains between dispatches and the
    # measurement undercounts by ~15%)
    B = 16384
    r = jnp.asarray(rng.integers(0, n_reads, B).astype(np.int32))
    s = jnp.asarray(rng.integers(0, n_reads, B).astype(np.int32))
    X = unpack_rows(d_dp, s, 256)
    Y = unpack_rows(d_qp, r, 256)
    xl = d_dlen[s]
    yl = d_qlen[r]
    nb, rb = PIPE4_VARIANTS[256]
    fn = (
        functools.partial(nw_stats_batch_pallas_pipe4, n_blk=nb, rblk=rb)
        if eng._use_pallas
        else nw_stats_batch
    )
    run = lambda: fn(
        X, Y, xl, yl, eng.cfg.igap, eng.cfg.egap, max_len=256
    )
    np.asarray(run().best_score)  # warm + materialize inputs
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out.best_score)
    dt = (time.perf_counter() - t0) / reps
    return round(B * 250 * 250 / dt / 1e9, 2)


def kernel_gcups_at(L: int, B: int = 2048, reps: int = 3) -> float:
    """Compiled stats-kernel GCUPS at length bucket L through the SAME
    dispatch choice the production resolve path makes (resolve.py
    PIPE4_VARIANTS -> v4 kernel, else the v3 pipelined kernel)."""
    import functools

    import jax
    import jax.numpy as jnp

    from imsame_tpu.ops.nw import nw_stats_batch
    from imsame_tpu.ops.nw_pallas import (
        nw_stats_batch_pallas_pipe3,
        nw_stats_batch_pallas_pipe4,
    )
    from imsame_tpu.ops.resolve import PIPE4_VARIANTS

    on_tpu = jax.default_backend() == "tpu"
    v4 = PIPE4_VARIANTS.get(L)
    if not on_tpu:
        fn = nw_stats_batch
    elif v4 is not None and B % (v4[0] * v4[1] * 16) == 0:
        fn = functools.partial(
            nw_stats_batch_pallas_pipe4, n_blk=v4[0], rblk=v4[1]
        )
    else:
        fn = nw_stats_batch_pallas_pipe3
    rlen = min(L - 2, int(L * 0.98))
    rng = np.random.default_rng(L)
    X = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.uint8))
    Y = jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.uint8))
    xl = jnp.full(B, rlen, jnp.int32)
    yl = jnp.full(B, rlen, jnp.int32)
    run = lambda: fn(X, Y, xl, yl, -5, -2, max_len=L)
    np.asarray(run().best_score)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out.best_score)
    dt = (time.perf_counter() - t0) / reps
    return round(B * rlen * rlen / dt / 1e9, 2)


def longread_bench() -> dict:
    """Long-read envelope on hardware (VERDICT r4 item 3): an end-to-end
    compare + byte-parity check with reads spanning ~300..3000 bp
    (the reference's full MAX_READ_SIZE envelope, src/structs.h:19), and
    compiled-kernel GCUPS at every long length bucket through the
    production dispatch."""
    import random as _random
    import sys as _sys
    import tempfile
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from util_synth import (
        mutate,
        parse_reference_summary,
        random_read,
        reference_binaries,
        run_reference,
        write_fasta,
    )

    from imsame_tpu.config import Config
    from imsame_tpu.io.fasta import read_fasta
    from imsame_tpu.pipeline import TpuEngine

    rng = _random.Random(4242)
    nq = 512
    q_reads = [random_read(rng, rng.randint(300, 3000)) for _ in range(nq)]
    db_reads = [
        mutate(rng, q_reads[i], 0.04, 0.01)
        if i % 2 == 0
        else random_read(rng, rng.randint(300, 3000))
        for i in range(nq)
    ]
    rng.shuffle(db_reads)
    out = {
        "metric": "long-read envelope (512 reads, 300..3000 bp)",
        "n_reads": nq,
    }
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        write_fasta(td / "q.fa", q_reads, "q")
        write_fasta(td / "db.fa", db_reads, "d")
        q = read_fasta(str(td / "q.fa"))
        db = read_fasta(str(td / "db.fa"))
        eng = TpuEngine(db, Config())
        eng.render_report(q, eng.compare(q))  # warm long-bucket compiles
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = eng.compare(q)
            runs.append(round(time.perf_counter() - t0, 3))
        t_r = time.perf_counter()
        report = eng.render_report(q, res)
        out["align_seconds_runs"] = sorted(runs)
        out["render_seconds"] = round(time.perf_counter() - t_r, 3)
        out["accepted"] = res.accepted
        out["nw_cells"] = res.nw_cells
        out["gcups_align"] = round(res.nw_cells / min(runs) / 1e9, 2)
        ref = reference_binaries()
        if ref is not None:
            ref_out = td / "ref.align"
            stdout = run_reference(
                ref[0], td / "q.fa", td / "db.fa", ref_out, n_threads=1
            )
            accepted_ref, _, _ = parse_reference_summary(stdout)
            assert res.accepted == accepted_ref, (
                res.accepted, accepted_ref
            )
            out["parity"] = (
                "byte-identical"
                if report == ref_out.read_bytes()
                else "MISMATCH"
            )
    out["kernel_gcups_by_bucket"] = {
        str(L): kernel_gcups_at(L, B=1024 if L >= 2048 else 2048)
        for L in (512, 1024, 2048, 3072)
    }
    return out


# Reference end-to-end wall at the 100k x 100k workload, measured in this
# environment in round 3 (4 threads, gcc -O3, same synthetic generator;
# BASELINE.md "100k x 100k" section).  Re-measuring it would cost ~73
# CPU-seconds per bench run, so the constant is pinned here with its
# provenance instead.
REFERENCE_100K_WALL_S = 73.2


def large_bench(**cfg_kwargs) -> dict:
    """Second timed config: 100k x 100k reads (BASELINE config-2 scale),
    end-to-end through a fresh engine (parse-free synthetic SeqInfo ->
    index build -> compare -> render), single timed run.  The accepted
    count is deterministic for the fixed seed (50,110 verified
    byte-identical vs the reference binary in round 3), so it doubles as
    a correctness check without paying a 73 s reference run."""
    from imsame_tpu.config import Config
    from imsame_tpu.pipeline import TpuEngine

    n = 100_000
    qc, dbc = synth_pair(n, 250, 0.5, seed=12345)
    q = codes_to_seqinfo(qc)
    db = codes_to_seqinfo(dbc)
    eng0 = TpuEngine(db, Config(**cfg_kwargs))
    # Warm the 100k-shaped compiles (pow2 table sizes differ from the
    # 20k config, so the warmed 20k shapes do not cover them; a cold
    # compile behind the tunnel costs ~60 s and would land in the timed
    # run otherwise).  The timed section below then measures steady
    # state, like the 20k flow.
    eng0.render_report(q, eng0.compare(q))
    del eng0
    t0 = time.perf_counter()
    eng = TpuEngine(db, Config(**cfg_kwargs))
    t_index = time.perf_counter() - t0
    # best-of-N align, default 4 (tunnel latency swings ~2x between
    # minutes; the 20k headline uses best-of-5 for the same reason)
    aligns = []
    best_timings = {}
    for _ in range(int(os.environ.get("IMSAME_BENCH_LARGE_RUNS", "4"))):
        eng.timer.reset()
        t1 = time.perf_counter()
        res = eng.compare(q)
        dt = time.perf_counter() - t1
        if not aligns or dt < min(aligns):
            best_timings = dict(eng.timer.items())
        aligns.append(dt)
    t_align = min(aligns)
    t2 = time.perf_counter()
    report_bytes = len(eng.render_report(q, res))
    t_render = time.perf_counter() - t2
    t_e2e = t_index + t_align + t_render
    return {
        "metric": "100k x 100k end-to-end (index+align+render)",
        "n_reads": n,
        "accepted": res.accepted,
        "expected_accepted": 50_110,
        # enforced, not just displayed: a silent accept-count regression
        # must not ride along looking like a normal run
        "accepted_ok": res.accepted == 50_110,
        "index_seconds": round(t_index, 2),
        "align_seconds": round(t_align, 2),
        "align_seconds_runs": [round(t, 2) for t in sorted(aligns)],
        "render_seconds": round(t_render, 2),
        "e2e_seconds": round(t_e2e, 2),
        "reads_per_s_align": round(n / t_align, 1),
        "reference_e2e_seconds": REFERENCE_100K_WALL_S,
        "vs_reference_e2e": round(REFERENCE_100K_WALL_S / t_e2e, 2),
        "timings": {k: round(v, 3) for k, v in best_timings.items()},
        # per-stage (candidates, gate passes, unique NW pairs)
        "stage_stats": {k: list(v) for k, v in eng.stage_stats.items()},
    }


def roofline(res, timings, kernel_gcups=None) -> dict:
    """NW-phase GCUPS vs an estimated VPU int32 roofline (VERDICT item 4).

    The wavefront kernel is VPU-bound int32 work: ~50 vector ops per DP
    cell (scores, two nonlocal gap moves, row/col max maintenance, stat
    packing -- ops/nw_pallas.py inner step).  TPU v5e VPU peak ~= 8
    sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 int32 ops/s, so
    speed-of-light is ~77 Gcells/s/chip.  Only meaningful on TPU; on CPU
    the same fields report against an unknown peak (utilization null)."""
    import jax

    nw_wall = timings.get("resolve.nw", 0.0)
    if not nw_wall or not res.nw_cells:
        return {}
    gcups_nw = res.nw_cells / nw_wall / 1e9
    backend = jax.default_backend()
    gk = kernel_gcups if kernel_gcups is not None else gcups_nw
    out = {
        "nw_phase_gcups": round(gcups_nw, 3),
        **({"nw_kernel_gcups": kernel_gcups} if kernel_gcups else {}),
        "roofline": {
            "backend": backend,
            "ops_per_cell_est": 50,
            "vpu_peak_int32_ops_per_s": 3.85e12 if backend == "tpu" else None,
            "peak_gcups_est": 77.0 if backend == "tpu" else None,
            "utilization_pct": round(100 * gk / 77.0, 1)
            if backend == "tpu"
            else None,
        },
    }
    return out


def main() -> int:
    n_reads = int(os.environ.get("IMSAME_BENCH_READS", "20000"))
    read_len = 250

    from imsame_tpu.config import Config
    from imsame_tpu.pipeline import TpuEngine

    qc, dbc = synth_pair(n_reads, read_len, 0.5, seed=12345)
    q = codes_to_seqinfo(qc)
    db = codes_to_seqinfo(dbc)

    t0 = time.perf_counter()
    eng = TpuEngine(db, Config())
    t_index = time.perf_counter() - t0

    # Warmup with the full query: compiled shapes are keyed on the (pow2-
    # quantized) table sizes, so only a same-size compare triggers every
    # compile outside the timed run.  In production (all-vs-all over many
    # sample pairs) compiles amortize the same way.  Render warms too --
    # its bp-kernel compiles (~2 s) would otherwise land in the timed
    # render below.
    eng.render_report(q, eng.compare(q))

    # Best of five timed runs: the TPU sits behind a tunnel whose latency/
    # bandwidth vary ~3x between runs (and the host VM is intermittently
    # contended); the best run is the least noise-contaminated estimate
    # of the engine's throughput.
    runs = []
    attempts = 0
    while len(runs) < int(os.environ.get("IMSAME_BENCH_RUNS", "5")):
        eng.timer.reset()
        t1 = time.perf_counter()
        try:
            res = eng.compare(q)
        except Exception as e:
            # transient tunnel/backend hiccup (observed: FAILED_PRECONDITION
            # mid-session); one bad run must not kill the round's artifact
            attempts += 1
            if attempts > 2:
                raise
            print(f"# retrying timed run after {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        runs.append((
            time.perf_counter() - t1, res, dict(eng.timer.items()),
            dict(eng.stage_stats),
        ))
    runs.sort(key=lambda x: x[0])
    t_align, res, timings, stage_stats = runs[0]

    # Render wall at bench scale (the C baseline's 2.7k reads/s includes
    # writing -out records during alignment, src/alignmentFunctions.c:167;
    # our render is a separate phase, so report it separately AND folded
    # into a comparable end-to-end rate).
    t_r0 = time.perf_counter()
    report_bytes = len(eng.render_report(q, res))
    t_render = time.perf_counter() - t_r0

    # Byte-parity vs the compiled reference at bench scale (SURVEY.md 4.1)
    # -- on by default (IMSAME_BENCH_PARITY=0 disables); runs after the
    # timed section so it never perturbs the measurement.
    # Dedicated stats-kernel throughput (after the timed sections).
    kgc = None
    try:
        kgc = nw_kernel_gcups(eng, n_reads)
    except Exception:
        pass

    parity = None
    if os.environ.get("IMSAME_BENCH_PARITY", "1") != "0":
        parity = check_parity(eng, q, res, qc, dbc)

    # All-vs-all sweep throughput (north-star metric 3); runs after the
    # timed sections so it never perturbs them.
    sweep = None
    if os.environ.get("IMSAME_BENCH_SWEEP", "1") != "0":
        sweep = sweep_bench(qc)

    # 100k x 100k second timed config (BASELINE config-2 scale; VERDICT
    # r3 item 3: the large-workload claim must be driver-captured).  Runs
    # at the default bench size only, unless forced off.
    large = None
    if n_reads == 20000 and os.environ.get("IMSAME_BENCH_LARGE", "1") != "0":
        try:
            large = large_bench()
        except Exception as e:
            large = {"error": f"{type(e).__name__}: {e}"}

    # Long-read envelope block (VERDICT r4 item 3): parity + per-bucket
    # compiled-kernel GCUPS on hardware, every default bench run.
    longread = None
    if n_reads == 20000 and os.environ.get("IMSAME_BENCH_LONGREAD", "1") != "0":
        try:
            longread = longread_bench()
        except Exception as e:
            longread = {"error": f"{type(e).__name__}: {e}"}

    # Scaling efficiency (VERDICT item 7): measured separately on the
    # 8-virtual-device CPU mesh by bench_scaling.py; its last saved result
    # rides along so the driver captures an efficiency number every round.
    scaling = None
    try:
        from pathlib import Path

        scaling = json.loads(
            (Path(__file__).parent / "BENCH_SCALING.json").read_text()
        )
        # bench_scaling.py stamps git_rev/run_date; flag the rider as
        # stale only when SOURCE files changed since it was measured
        # (docs/artifact-only commits do not invalidate the measurement).
        import subprocess

        here = Path(__file__).parent
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=here, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        rev = scaling.get("git_rev")
        if rev and rev != head:
            diff = subprocess.run(
                ["git", "diff", "--name-only", f"{rev}..HEAD", "--",
                 "imsame_tpu", "bench.py", "bench_scaling.py"],
                cwd=here, capture_output=True, text=True, timeout=10,
            )
            changed = diff.stdout.strip()
            if diff.returncode != 0 or changed:
                scaling["stale"] = (
                    f"measured at {rev}, HEAD is {head}; source diff: "
                    f"{changed.splitlines()[:5] if changed else 'unknown'}"
                )
    except (OSError, ValueError):
        pass

    reads_per_s = n_reads / t_align
    gcups = res.nw_cells / t_align / 1e9
    payload = {
        "metric": "alignment-phase query reads/s (20k x 20k 250bp, 50% match)",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "detail": {
            "n_reads": n_reads,
            "accepted": res.accepted,
            "jaccard": round(res.jaccard, 6),
            "align_seconds": round(t_align, 3),
            "index_seconds": round(t_index, 3),
            "nw_cells": res.nw_cells,
            "gcups": round(gcups, 3),
            "candidates": res.n_candidates,
            "render_seconds": round(t_render, 3),
            "renders_per_s": round(res.accepted / max(t_render, 1e-9), 1),
            "report_bytes": report_bytes,
            "reads_per_s_incl_render": round(
                n_reads / (t_align + t_render), 1
            ),
            **roofline(res, timings, kernel_gcups=kgc),
            "align_seconds_runs": [round(t, 3) for t, _, _, _ in runs],
            "stage_stats": {k: list(v) for k, v in stage_stats.items()},
            **({"parity": parity} if parity is not None else {}),
            **({"sweep": sweep} if sweep is not None else {}),
            **({"large": large} if large is not None else {}),
            **({"longread": longread} if longread is not None else {}),
            **({"scaling": scaling} if scaling is not None else {}),
            "timings": {k: round(v, 3) for k, v in timings.items()},
        },
    }
    # Full payload first (bulky: scaling rider, timings, ...), compact
    # headline summary LAST -- the driver archives a bounded tail of
    # stdout, so the final line must carry every headline (VERDICT r4 #1).
    print(json.dumps(payload))
    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "vs_baseline": payload["vs_baseline"],
        "align_seconds_runs": payload["detail"]["align_seconds_runs"],
        "reads_per_s_incl_render": payload["detail"][
            "reads_per_s_incl_render"
        ],
        "accepted": res.accepted,
        "nw_kernel_gcups": kgc,
        **({"parity": parity} if parity is not None else {}),
    }
    if sweep is not None:
        summary["sweep_pairs_per_hour"] = sweep.get("pairs_per_hour")
        summary["sweep_wall_seconds"] = sweep.get("wall_seconds")
    if large is not None:
        summary["large"] = {
            k: large[k]
            for k in (
                "e2e_seconds",
                "align_seconds",
                "reads_per_s_align",
                "accepted_ok",
                "vs_reference_e2e",
            )
            if k in large
        }
        if "error" in large:
            summary["large"] = {"error": large["error"]}
    if longread is not None:
        summary["longread"] = {
            k: longread[k]
            for k in (
                "align_seconds_runs",
                "accepted",
                "parity",
                "kernel_gcups_by_bucket",
                "error",
            )
            if k in longread
        }
    print(json.dumps(summary))
    # A 100k accept-count regression must fail the bench loudly, not just
    # flip a JSON boolean (ADVICE r4).
    if large is not None and not large.get("accepted_ok", True):
        print("BENCH FAIL: 100k accepted count regression", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
