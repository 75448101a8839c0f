"""Golden parity: the oracle engine must reproduce the reference binary's
-out file byte-for-byte (n_threads=1 makes record order deterministic) and
its accepted-read count (SURVEY.md section 4)."""

import random
from pathlib import Path

import pytest

from imsame_tpu.config import Config
from imsame_tpu.io.fasta import read_fasta
from imsame_tpu.oracle.engine import OracleEngine
from util_synth import (
    make_pair,
    parse_reference_summary,
    reference_binaries,
    run_reference,
)


def _compare(tmp_path: Path, seed: int, cfg_extra=None, **pair_kw):
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    imsame, _ = ref
    rng = random.Random(seed)
    qp, dp = make_pair(tmp_path, rng, **pair_kw)
    ref_out = tmp_path / "ref.align"
    extra = []
    cfg = Config()
    if cfg_extra:
        for k, v in cfg_extra.items():
            setattr(cfg, k, v)
        if "min_coverage" in cfg_extra:
            extra += ["-coverage", str(cfg_extra["min_coverage"])]
        if "min_identity" in cfg_extra:
            extra += ["-identity", str(cfg_extra["min_identity"])]
        if "min_e_value" in cfg_extra:
            extra += ["-evalue", str(cfg_extra["min_e_value"])]
        if "igap" in cfg_extra:
            extra += ["-igap", str(-cfg_extra["igap"])]
        if "egap" in cfg_extra:
            extra += ["-egap", str(-cfg_extra["egap"])]
    stdout = run_reference(imsame, qp, dp, ref_out, n_threads=1, extra=extra)
    accepted_ref, n_q, n_db = parse_reference_summary(stdout)

    eng = OracleEngine(read_fasta(str(dp)), cfg)
    res = eng.compare(read_fasta(str(qp)))

    assert res.accepted == accepted_ref
    assert res.n_query == n_q and res.n_db == n_db
    assert res.out_bytes == ref_out.read_bytes()


def test_parity_substitutions_only(tmp_path):
    _compare(tmp_path, 1, n_query=30, n_db=30, read_len=150, sub_rate=0.04)


def test_parity_with_indels(tmp_path):
    _compare(
        tmp_path, 2, n_query=25, n_db=25, read_len=160, sub_rate=0.05, indel_rate=0.03
    )


def test_parity_heavy_mutation(tmp_path):
    # near the identity/coverage gates
    _compare(
        tmp_path, 3, n_query=20, n_db=20, read_len=140, sub_rate=0.25, indel_rate=0.05
    )


def test_parity_multiline_fasta(tmp_path):
    _compare(tmp_path, 4, n_query=15, n_db=15, read_len=180, line_len=60)


def test_parity_varied_lengths(tmp_path):
    # different read lengths query vs db via indels
    _compare(
        tmp_path, 5, n_query=20, n_db=20, read_len=120, sub_rate=0.08, indel_rate=0.10
    )


def test_parity_nondefault_thresholds(tmp_path):
    _compare(
        tmp_path,
        6,
        cfg_extra={"min_coverage": 0.3, "min_identity": 0.7, "igap": -3, "egap": -1},
        n_query=20,
        n_db=20,
        read_len=150,
        sub_rate=0.1,
        indel_rate=0.04,
    )
