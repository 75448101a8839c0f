import random
from pathlib import Path

import numpy as np
import pytest

from imsame_tpu.io.fasta import (
    parse_fasta_bytes,
    read_fasta,
    revcomp_fasta,
    revcomp_fasta_bytes,
    valid_db_kmer_starts,
)
from util_synth import reference_binaries, write_fasta

import subprocess


def test_basic_parse():
    data = b">r0\nACGT\n>r1\nacgtACGT\n"
    si = parse_fasta_bytes(data)
    assert si.n_seqs == 2
    assert si.total_len == 12
    np.testing.assert_array_equal(si.start, [0, 4])
    np.testing.assert_array_equal(si.codes[:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(si.codes[4:8], [0, 1, 2, 3])
    assert si.headers == [b"r0", b"r1"]


def test_non_acgt_dropped_and_resets():
    # N is dropped from the concatenated array but resets the k-mer window.
    data = b">x\nACGTN\nACGT\n"
    si = parse_fasta_bytes(data)
    assert si.total_len == 8
    # fresh at read start and at the base right after the N
    np.testing.assert_array_equal(
        si.fresh, [True, False, False, False, True, False, False, False]
    )
    # newline does NOT reset: the two lines of the second read join.
    data2 = b">x\nACGTACG\nTACGTA\n"
    si2 = parse_fasta_bytes(data2)
    assert si2.total_len == 13
    assert si2.fresh.sum() == 1  # only the read start
    starts = valid_db_kmer_starts(si2, k=12)
    np.testing.assert_array_equal(starts, [0, 1])


def test_kmer_starts_respect_resets():
    data = b">x\n" + b"A" * 12 + b"N" + b"C" * 12 + b"\n"
    si = parse_fasta_bytes(data)
    starts = valid_db_kmer_starts(si, k=12)
    np.testing.assert_array_equal(starts, [0, 12])  # no window spans the N


def test_multiline_and_case():
    data = b">x\nacg\ntAC\ngt\n"
    si = parse_fasta_bytes(data)
    assert si.total_len == 8
    np.testing.assert_array_equal(si.codes, [0, 1, 2, 3, 0, 1, 2, 3])


def test_empty_and_headerless_prefix():
    si = parse_fasta_bytes(b"junk\nACGT\n>only\nGGCC\n")
    # bases before the first '>' are dropped
    assert si.n_seqs == 1
    assert si.total_len == 4


def test_revcomp_matches_reference(tmp_path: Path):
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    _, revcomp_bin = ref
    rng = random.Random(3)
    reads = [
        "".join(rng.choice("ACGTacgtN") for _ in range(rng.randrange(30, 90)))
        for _ in range(7)
    ]
    fa = tmp_path / "in.fa"
    write_fasta(fa, reads, line_len=25)
    ref_out = tmp_path / "ref.fa"
    subprocess.run([str(revcomp_bin), str(fa), str(ref_out)], check=True)
    ours = revcomp_fasta_bytes(fa.read_bytes())
    assert ours == ref_out.read_bytes()


def test_revcomp_roundtrip_file(tmp_path: Path):
    fa = tmp_path / "a.fa"
    fa.write_bytes(b">h1 desc\nACGTU\n>h2\nggcc\n")
    out = tmp_path / "b.fa"
    revcomp_fasta(str(fa), str(out))
    txt = out.read_bytes()
    # reverse file order; revcomp; U->A
    assert txt == b">h2\nggcc\n>h1 desc\nAACGT\n"
