"""All-vs-all orchestrator vs the reference driver semantics: same pair
jobs (forward + revcomp), byte-identical per-pair reports, resume
behavior, and host striping."""

import random
import subprocess
from pathlib import Path

import pytest

from imsame_tpu.config import Config
from imsame_tpu.orchestrator import AllVsAllRunner, list_samples, make_jobs
from util_synth import make_pair, random_read, reference_binaries, write_fasta


def _mk_samples(tmp_path, rng, n_samples=3, n_reads=12, read_len=120):
    d = tmp_path / "samples"
    d.mkdir()
    base = [random_read(rng, read_len) for _ in range(n_reads)]
    for s in range(n_samples):
        reads = []
        for i, r in enumerate(base):
            if (i + s) % 2 == 0:
                # mutated shared read
                rl = list(r)
                for _ in range(3):
                    p = rng.randrange(len(rl))
                    rl[p] = rng.choice("ACGT")
                reads.append("".join(rl))
            else:
                reads.append(random_read(rng, read_len))
        write_fasta(d / f"s{s}.fasta", reads, prefix=f"s{s}r")
    return d


def test_job_list_matches_reference_driver(tmp_path):
    rng = random.Random(0)
    d = _mk_samples(tmp_path, rng)
    samples = list_samples(str(d), "fasta")
    jobs = make_jobs(samples)
    names = [j.out_name for j in jobs]
    # reference driver: for i<j, X-Y.align and X-Y.r.align (sh:35-48)
    assert names == [
        "s0-s1.align", "s0-s1.r.align",
        "s0-s2.align", "s0-s2.r.align",
        "s1-s2.align", "s1-s2.r.align",
    ]


def test_all_vs_all_matches_reference(tmp_path):
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    imsame, revcomp = ref
    rng = random.Random(1)
    d = _mk_samples(tmp_path, rng)
    samples = list_samples(str(d), "fasta")

    out = tmp_path / "ours"
    runner = AllVsAllRunner(str(out), Config())
    stats = runner.run(samples)
    assert len(stats) == 6

    # reference run per pair
    refdir = tmp_path / "ref"
    refdir.mkdir()
    for i in range(len(samples)):
        for j in range(i + 1, len(samples)):
            (xn, xp), (yn, yp) = samples[i], samples[j]
            fwd = refdir / f"{xn}-{yn}.align"
            subprocess.run(
                [str(imsame), "-query", str(xp), "-db", str(yp),
                 "-n_threads", "1", "-out", str(fwd)],
                check=True, capture_output=True)
            rc = tmp_path / f"{yn}.r.fasta"
            subprocess.run([str(revcomp), str(yp), str(rc)], check=True)
            rev = refdir / f"{xn}-{yn}.r.align"
            subprocess.run(
                [str(imsame), "-query", str(xp), "-db", str(rc),
                 "-n_threads", "1", "-out", str(rev)],
                check=True, capture_output=True)

    for f in sorted(refdir.glob("*.align")):
        ours = out / f.name
        assert ours.exists(), f.name
        assert ours.read_bytes() == f.read_bytes(), f.name


def test_resume_skips_existing(tmp_path):
    rng = random.Random(2)
    d = _mk_samples(tmp_path, rng, n_samples=2)
    samples = list_samples(str(d), "fasta")
    out = tmp_path / "o"
    runner = AllVsAllRunner(str(out), Config())
    s1 = runner.run(samples)
    # poison one output; resume must keep it untouched
    marker = out / "s0-s1.align"
    marker.write_bytes(b"SENTINEL")
    runner2 = AllVsAllRunner(str(out), Config())
    runner2.run(samples)
    assert marker.read_bytes() == b"SENTINEL"


def test_host_striping_partitions_jobs(tmp_path):
    rng = random.Random(3)
    d = _mk_samples(tmp_path, rng, n_samples=3)
    samples = list_samples(str(d), "fasta")
    out0 = tmp_path / "h0"
    out1 = tmp_path / "h1"
    s0 = AllVsAllRunner(str(out0), Config(), host_id=0, n_hosts=2).run(samples)
    s1 = AllVsAllRunner(str(out1), Config(), host_id=1, n_hosts=2).run(samples)
    assert set(s0) | set(s1) == {j.out_name for j in make_jobs(samples)}
    assert not (set(s0) & set(s1))


def test_failure_isolation(tmp_path):
    """A pair job that raises must not kill the sweep; it's recorded and
    left for the next (resumed) run."""
    import json

    from imsame_tpu.orchestrator import AllVsAllRunner, list_samples

    d = tmp_path / "samples"
    d.mkdir()
    (d / "a.fasta").write_text(">r0\nACGTACGTACGTACGTACGT\n")
    (d / "b.fasta").write_text(">r0\nACGTACGTACGTACGTACGT\n")
    out = tmp_path / "out"
    runner = AllVsAllRunner(str(out))
    orig = runner._engine_for

    def boom(job):
        if job.reverse:
            raise RuntimeError("injected device failure")
        return orig(job)

    runner._engine_for = boom
    stats = runner.run(list_samples(str(d), "fasta"))
    assert "a-b.align" in stats  # forward job completed
    assert "a-b.r.align" not in stats  # reverse job failed, not silently ok
    assert "a-b.r.align" in runner.failures
    failp = out / "failures.host0.json"
    assert json.loads(failp.read_text())["a-b.r.align"].startswith("RuntimeError")
    assert not (out / "a-b.r.align").exists()  # eligible for resume/retry


def test_render_worker_failure_isolation(tmp_path):
    """A failure on the deferred-render worker thread (render_report runs
    there since round 4) must be recorded like a compare-side failure:
    no output file (eligible for resume), entry in failures, other jobs
    unaffected."""
    import json

    from imsame_tpu.orchestrator import AllVsAllRunner, list_samples
    from imsame_tpu.pipeline import TpuEngine

    d = tmp_path / "samples"
    d.mkdir()
    (d / "a.fasta").write_text(">r0\nACGTACGTACGTACGTACGT\n")
    (d / "b.fasta").write_text(">r0\nACGTACGTACGTACGTACGT\n")
    out = tmp_path / "out"
    runner = AllVsAllRunner(str(out))
    orig = TpuEngine.render_report

    def boom(self, q, result, dev=None):
        if getattr(self, "_boom", False):
            raise RuntimeError("injected render failure")
        return orig(self, q, result, dev=dev)

    orig_engine_for = runner._engine_for

    def mark(job):
        eng = orig_engine_for(job)
        eng._boom = job.reverse
        return eng

    runner._engine_for = mark
    TpuEngine.render_report = boom
    try:
        stats = runner.run(list_samples(str(d), "fasta"))
    finally:
        TpuEngine.render_report = orig
    assert "a-b.align" in stats  # forward job completed
    assert "a-b.r.align" not in stats
    assert runner.failures["a-b.r.align"].startswith("RuntimeError")
    assert not (out / "a-b.r.align").exists()  # eligible for retry
    failp = out / "failures.host0.json"
    assert "a-b.r.align" in json.loads(failp.read_text())


def test_engine_cache_lru_bound_and_index_persistence(tmp_path):
    """BASELINE config 5 hardening: a sweep holds at most max_engines
    device-resident engines, and each sample's index is built once and
    reloaded from the per-sweep cache on resume."""
    import random

    from imsame_tpu.orchestrator import AllVsAllRunner, list_samples
    from util_synth import random_read, write_fasta

    rng = random.Random(5)
    d = tmp_path / "samples"
    d.mkdir()
    for i in range(4):
        write_fasta(d / f"s{i}.fasta", [random_read(rng, 150) for _ in range(6)])
    out = tmp_path / "out"
    runner = AllVsAllRunner(str(out), max_engines=2)
    samples = list_samples(str(d), "fasta")
    runner.run(samples)
    assert len(runner._engines) <= 2
    # one persisted index per (db sample, strand) that served as a db
    idx_files = sorted(p.name for p in (out / ".index").glob("*.npz"))
    assert len(idx_files) == len({(j.dbname, j.reverse) for j in
                                  __import__("imsame_tpu.orchestrator",
                                             fromlist=["make_jobs"])
                                  .make_jobs(samples)})

    # resume in a fresh runner: outputs exist, so no engine is built
    runner2 = AllVsAllRunner(str(out), max_engines=2)
    stats = runner2.run(samples)
    assert len(runner2._engines) == 0
    assert len(stats) == 12  # 6 pairs x 2 strands
