"""Multi-host scaffolding (SURVEY.md 5.8): single-process degenerate path,
host query sharding equivalence with the reference's thread-split
semantics, and stat merging identity."""

import random

from imsame_tpu.config import Config
from imsame_tpu.distributed import (
    DistContext,
    allreduce_sum,
    init_distributed,
    read_offset_for_host,
    shard_query_for_host,
)
from imsame_tpu.io.fasta import parse_fasta_bytes
from imsame_tpu.pipeline import TpuEngine
from util_synth import make_pair


def test_single_process_degenerate():
    ctx = init_distributed(num_processes=1)
    assert ctx == DistContext(0, 1)
    assert not ctx.is_distributed
    assert allreduce_sum(7, ctx) == 7


def test_host_sharding_matches_thread_split(tmp_path):
    """Two host shards, even read count: the union of per-host accepted
    pairs (offset back to global read ids) equals the single-engine run
    with n_threads=2 -- host boundaries behave exactly like the
    reference's thread boundaries (src/alignmentFunctions.c:93-105)."""
    rng = random.Random(91)
    n = 40  # even: floor(n/2) thread split == ceil(n/2) host split
    qp, dp = make_pair(tmp_path, rng, n_query=n, n_db=n, read_len=150,
                       sub_rate=0.05, indel_rate=0.02)
    q = parse_fasta_bytes(qp.read_bytes())
    db = parse_fasta_bytes(dp.read_bytes())

    eng = TpuEngine(db, Config(n_threads=2))
    want = set(eng.compare(q).pairs)

    got = set()
    total = 0
    for pid in range(2):
        ctx = DistContext(pid, 2)
        qs = shard_query_for_host(q, ctx)
        off = read_offset_for_host(q.n_seqs, ctx)
        res = TpuEngine(db, Config()).compare(qs)
        got |= {(r + off, s) for r, s in res.pairs}
        total += res.accepted
    assert got == want
    assert total == len(want)
