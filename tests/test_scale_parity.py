"""Scale parity vs the reference binary (SURVEY.md section 4.1 / BASELINE
config 1): 1k x 1k reads at 150 bp, byte-identical report at n_threads=1,
and record-set equality at n_threads=4 (the reference's -out records
interleave arbitrarily under >1 thread, src/alignmentFunctions.c:167)."""

import os
import random
import re

import pytest

from imsame_tpu.config import Config
from imsame_tpu.io.fasta import read_fasta
from imsame_tpu.pipeline import TpuEngine
from util_synth import (
    make_pair,
    parse_reference_summary,
    reference_binaries,
    run_reference,
)

RECORD_RE = re.compile(rb"(?m)^\(")

# One atomic fprintf in the reference (src/alignmentFunctions.c:167): the
# record header.  The block is a second, separate fprintf (:168), so under
# >1 thread another thread's chunk can land *between* a record's header and
# its block ("torn" records).  Headers are self-delimiting; blocks are not.
HEADER_RE = re.compile(rb"(?m)^\(\d+, \d+\) : \d+% \d+% \d+\n \$\$\$\$\$\$\$ \n")


def split_records(report: bytes):
    """Split an -out report into per-record byte chunks (each starts with
    the '(qread, dbread) : ...' header at a line start).  Only valid for
    n_threads=1 output, where records are never torn."""
    starts = [m.start() for m in RECORD_RE.finditer(report)]
    return [
        report[s:e] for s, e in zip(starts, starts[1:] + [len(report)])
    ]


def tear_tolerant_parts(report: bytes):
    """Decompose a (possibly torn) report into (header multiset, residual
    block bytes as a sorted line multiset).  Each header and each block is
    written by one atomic fprintf, so the report is a shuffle-merge of
    those chunks; stripping the headers leaves a permutation-concatenation
    of the block chunks, which we compare as a line multiset."""
    headers = HEADER_RE.findall(report)
    residual = HEADER_RE.sub(b"", report)
    return sorted(headers), sorted(residual.split(b"\n"))


@pytest.fixture(scope="module")
def ref_bin():
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    return ref[0]


def test_scale_1k_byte_parity(tmp_path, ref_bin):
    n = int(os.environ.get("IMSAME_SCALE_READS", "1000"))
    rng = random.Random(77)
    qp, dp = make_pair(
        tmp_path, rng, n_query=n, n_db=n, read_len=150,
        sub_rate=0.04, indel_rate=0.01,
    )
    ref_out = tmp_path / "ref.align"
    stdout = run_reference(ref_bin, qp, dp, ref_out, n_threads=1)
    accepted_ref, _, _ = parse_reference_summary(stdout)

    q = read_fasta(str(qp))
    eng = TpuEngine(read_fasta(str(dp)), Config())
    res = eng.compare(q)
    assert res.accepted == accepted_ref
    assert eng.render_report(q, res) == ref_out.read_bytes()


def test_scale_threads4_record_set_parity(tmp_path, ref_bin):
    """n_threads=4: stream-boundary quirk per thread start emulated; the
    record multiset must match (order is interleaved in the reference)."""
    rng = random.Random(78)
    qp, dp = make_pair(
        tmp_path, rng, n_query=403, n_db=403, read_len=150,
        sub_rate=0.05, indel_rate=0.02,
    )
    ref_out = tmp_path / "ref4.align"
    stdout = run_reference(ref_bin, qp, dp, ref_out, n_threads=4)
    accepted_ref, _, _ = parse_reference_summary(stdout)

    q = read_fasta(str(qp))
    eng = TpuEngine(read_fasta(str(dp)), Config(n_threads=4))
    res = eng.compare(q)
    assert res.accepted == accepted_ref
    ours_h, ours_blocks = tear_tolerant_parts(eng.render_report(q, res))
    ref_h, ref_blocks = tear_tolerant_parts(ref_out.read_bytes())
    assert ours_h == ref_h
    assert ours_blocks == ref_blocks


def test_accepts_invariant_under_first_window(tmp_path):
    """The two-stage gate is accept-invariant in the stage-1 window size
    (first-accept-wins replay sees the same verdicts regardless of which
    stage surfaced them) -- the contract that lets first_window_auto
    retune F by dictionary load without changing results."""
    rng = random.Random(31)
    qp, dp = make_pair(tmp_path, rng, n_query=60, n_db=60, read_len=150,
                       sub_rate=0.05, indel_rate=0.02)
    q = read_fasta(str(qp))
    db = read_fasta(str(dp))
    base = None
    for cfg in (
        Config(first_window=1, first_window_auto=False, mesh_shape=None),
        Config(first_window=8, first_window_auto=False, mesh_shape=None),
        Config(first_window=64, first_window_auto=False, mesh_shape=None),
        Config(mesh_shape=None),  # auto
    ):
        res = TpuEngine(db, cfg).compare(q)
        got = (res.accepted, res.pairs)
        if base is None:
            base = got
        assert got == base
