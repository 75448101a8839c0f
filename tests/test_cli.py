"""CLI end-to-end: flags mirror the reference, output file byte-parity."""

import random
import re
import sys

import pytest

from imsame_tpu import cli
from util_synth import make_pair, reference_binaries, run_reference

# Timing values differ by definition (the reference reports clock()
# CPU-seconds, src/IMSAME.c:470; we report wall time) -- mask the numeric
# field of every "%e seconds" occurrence before comparing stdout.
TIME_RE = re.compile(r"\d\.\d{6}e[+-]\d{2,3}(?= seconds)")


def test_cli_roundtrip(tmp_path, capsys):
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    imsame, _ = ref
    rng = random.Random(5)
    qp, dp = make_pair(tmp_path, rng, n_query=15, n_db=15, read_len=130,
                       sub_rate=0.06, indel_rate=0.02)
    ref_out = tmp_path / "ref.align"
    run_reference(imsame, qp, dp, ref_out, n_threads=1)

    out = tmp_path / "ours.align"
    rc = cli.main([
        "-query", str(qp), "-db", str(dp), "-out", str(out),
        "-n_threads", "1",
    ])
    assert rc == 0
    assert out.read_bytes() == ref_out.read_bytes()
    cap = capsys.readouterr().out
    assert "Jaccard-index" in cap


def test_cli_stdout_info_parity(tmp_path, capsys):
    """Every reference [INFO] line (src/IMSAME.c:63-473) appears byte-
    identically in our stdout, with timing values masked (CPU- vs
    wall-seconds)."""
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    imsame, _ = ref
    rng = random.Random(6)
    qp, dp = make_pair(tmp_path, rng, n_query=25, n_db=25, read_len=140,
                       sub_rate=0.05, indel_rate=0.02)
    ref_stdout = run_reference(imsame, qp, dp, tmp_path / "r.align",
                               n_threads=1)
    rc = cli.main([
        "-query", str(qp), "-db", str(dp),
        "-out", str(tmp_path / "o.align"), "-n_threads", "1",
    ])
    assert rc == 0
    ours = capsys.readouterr().out

    def masked_info(s: str):
        return [TIME_RE.sub("<t>", ln) for ln in s.splitlines()
                if ln.startswith("[INFO]")]

    assert masked_info(ours) == masked_info(ref_stdout)


def test_cli_help_byte_parity(capsys):
    """--help prints the reference's usage block verbatim and exits 1
    (src/IMSAME.c:525-539); golden-checked against the live binary when
    available, and against the pinned copy always."""
    rc = cli.main(["--help"])
    assert rc == 1
    ours = capsys.readouterr().out
    assert ours == cli.REFERENCE_HELP

    ref = reference_binaries()
    if ref is None:
        return
    import subprocess

    r = subprocess.run(
        [str(ref[0]), "--help"], capture_output=True, text=True, timeout=30
    )
    assert r.returncode == 1
    assert ours == r.stdout


def test_cli_flag_negation():
    args = cli.build_parser().parse_args(
        ["-query", "q", "-db", "d", "-igap", "3", "-egap", "1"]
    )
    cfg = cli.config_from_args(args)
    assert cfg.igap == -3 and cfg.egap == -1


def test_cli_rejects_bad_thresholds():
    p = cli.build_parser()
    with pytest.raises(SystemExit):
        cli.config_from_args(p.parse_args(
            ["-query", "q", "-db", "d", "-coverage", "0"]))
    with pytest.raises(SystemExit):
        cli.config_from_args(p.parse_args(
            ["-query", "q", "-db", "d", "-evalue", "-1"]))


def test_revcomp_cli(tmp_path):
    from imsame_tpu import revcomp

    fa = tmp_path / "in.fa"
    fa.write_text(">a\nACGT\n>b\nTTnna\n")
    out = tmp_path / "out.fa"
    assert revcomp.main([str(fa), str(out)]) == 0
    # reverse file order, complemented+reversed, one line per read
    assert out.read_text() == ">b\ntnnAA\n>a\nACGT\n"
    assert revcomp.main([str(fa)]) == 1
