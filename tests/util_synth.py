"""Test utilities: synthetic FASTA generation and the reference C oracle.

The reference repo ships no tests; per SURVEY.md section 4 the compiled
reference binary is the behavioral oracle.  We build it from the read-only
source tree into a cache dir outside the repo and shell out to it.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

REF_SRC = Path("/root/reference/src")
REF_BIN_PREBUILT = Path("/root/reference/bin/IMSAME")
REVCOMP_PREBUILT = Path("/root/reference/bin")
BUILD_DIR = Path("/tmp/imsame_ref_build")


def reference_binaries() -> Optional[Tuple[Path, Path]]:
    """Return (IMSAME, revComp) paths, building from source if possible."""
    imsame = BUILD_DIR / "bin" / "IMSAME"
    revcomp = BUILD_DIR / "bin" / "revComp"
    if imsame.exists() and revcomp.exists():
        return imsame, revcomp
    if REF_SRC.exists() and shutil.which("gcc"):
        src = BUILD_DIR / "src"
        src.mkdir(parents=True, exist_ok=True)
        (BUILD_DIR / "bin").mkdir(parents=True, exist_ok=True)
        for f in REF_SRC.iterdir():
            shutil.copy(f, src / f.name)
        r = subprocess.run(["make"], cwd=src, capture_output=True)
        if r.returncode == 0 and imsame.exists():
            return imsame, revcomp
    pre_im = REF_BIN_PREBUILT
    pre_rc = REVCOMP_PREBUILT / "revComp"
    if pre_im.exists():
        return pre_im, pre_rc if pre_rc.exists() else pre_im
    return None


def run_reference(
    imsame: Path,
    query: Path,
    db: Path,
    out: Path,
    n_threads: int = 1,
    extra: Optional[List[str]] = None,
) -> str:
    cmd = [
        str(imsame),
        "-query",
        str(query),
        "-db",
        str(db),
        "-n_threads",
        str(n_threads),
        "-out",
        str(out),
    ] + (extra or [])
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"reference failed: {r.stdout}\n{r.stderr}"
    return r.stdout


def parse_reference_summary(stdout: str) -> Tuple[int, int, int]:
    """(accepted, n_query, n_db) from the reference's summary line."""
    for line in stdout.splitlines():
        if "were found in the database" in line:
            # [INFO] N reads (Q) from the query were found in the database (D) ...
            parts = line.split()
            accepted = int(parts[1])
            n_query = int(parts[3].strip("()"))
            n_db = int(parts[12].strip("()"))
            return accepted, n_query, n_db
    raise AssertionError("summary line not found in reference stdout")


# --- synthetic data ---

def random_read(rng: random.Random, length: int) -> str:
    return "".join(rng.choice("ACGT") for _ in range(length))


def mutate(rng: random.Random, read: str, sub_rate=0.04, indel_rate=0.0) -> str:
    out = []
    for ch in read:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(rng.choice("ACGT"))  # insertion before ch
        if rng.random() < sub_rate:
            out.append(rng.choice([c for c in "ACGT" if c != ch]))
        else:
            out.append(ch)
    return "".join(out)


def write_fasta(path: Path, reads: List[str], prefix: str = "r", line_len: int = 0):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{prefix}{i}\n")
            if line_len and line_len > 0:
                for s in range(0, len(r), line_len):
                    f.write(r[s : s + line_len] + "\n")
            else:
                f.write(r + "\n")


def make_pair(
    tmpdir: Path,
    rng: random.Random,
    n_query: int = 40,
    n_db: int = 40,
    read_len: int = 150,
    match_frac: float = 0.5,
    sub_rate: float = 0.04,
    indel_rate: float = 0.0,
    line_len: int = 0,
) -> Tuple[Path, Path]:
    """Query reads + a db where match_frac of reads are mutated copies of
    query reads (mirrors the BASELINE.md workload)."""
    q = [random_read(rng, read_len) for _ in range(n_query)]
    n_match = int(n_db * match_frac)
    db = [mutate(rng, q[i % n_query], sub_rate, indel_rate) for i in range(n_match)]
    db += [random_read(rng, read_len) for _ in range(n_db - n_match)]
    qp = tmpdir / "q.fa"
    dp = tmpdir / "db.fa"
    write_fasta(qp, q, "q", line_len)
    write_fasta(dp, db, "d", line_len)
    return qp, dp
