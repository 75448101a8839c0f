"""Large-sample capacity (BASELINE config 3, ~1M-read samples): the
engine must handle databases/queries at and beyond the 2^20-read packed-
format boundary, single-device and under the ('data','dict') mesh.

Regimes exercised (pipeline.py decides per side):
  * packed  (n < 2^20 reads, len < 4096): one-word payloads
  * wide db (n_db >= 2^20): (pos, sid) index pair, row-range sharded
  * wide query (n_q >= 2^20): [5, N] candidate stacks (flat_gate /
    make_engine_gate_step_wide)
"""

import numpy as np
import pytest

from imsame_tpu.config import Config
from imsame_tpu.io.fasta import SeqInfo
from imsame_tpu.pipeline import TpuEngine

WIDE_N = (1 << 20) + 8


def batch_seqinfo(reads: np.ndarray) -> SeqInfo:
    """SeqInfo from a [n, L] uint8 code batch (no FASTA round trip --
    building million-read FASTA text dominates test time otherwise)."""
    n, L = reads.shape
    codes = reads.reshape(-1).copy()
    start = np.arange(n, dtype=np.int64) * L
    fresh = np.zeros(n * L, bool)
    fresh[start] = True
    return SeqInfo(codes=codes, start=start, fresh=fresh, headers=[b""] * n)


def planted_pair(n_db: int, n_q: int, L: int, seed: int, mut: float = 0.0):
    """db of n_db random reads; query of n_q reads, half copied from the
    db (optionally mutated) so accepts exist."""
    rng = np.random.default_rng(seed)
    db = rng.integers(0, 4, (n_db, L), dtype=np.uint8)
    nm = n_q // 2
    picks = rng.choice(n_db, nm, replace=False)
    qm = db[picks].copy()
    if mut:
        mask = rng.random((nm, L)) < mut
        qm[mask] = (qm[mask] + rng.integers(
            1, 4, int(mask.sum()), dtype=np.uint8)) % 4
    q = np.concatenate([qm, rng.integers(0, 4, (n_q - nm, L), dtype=np.uint8)])
    return q, db


def test_large_db_mesh_dict_axis():
    """200k-read database on the (2, 4) mesh: accept set and report match
    the single-device engine; each dict shard holds 1/4 of the payload."""
    q_codes, db_codes = planted_pair(200_000, 800, 100, seed=5, mut=0.03)
    q = batch_seqinfo(q_codes)
    db = batch_seqinfo(db_codes)

    eng1 = TpuEngine(db, Config(mesh_shape=None))
    res1 = eng1.compare(q)
    assert res1.accepted >= 350  # mutated copies accept

    eng = TpuEngine(db, Config(mesh_shape=(2, 4)))
    shard_bytes = eng._d_idx_tab.addressable_shards[0].data.nbytes
    assert shard_bytes == eng._d_idx_tab.nbytes // 4  # 1/4 payload/shard
    res = eng.compare(q)
    assert res.pairs == res1.pairs
    assert eng.render_report(q, res) == eng1.render_report(q, res1)


def test_wide_db_regime_beyond_2pow20():
    """Database past the packed boundary (2^20 + 8 reads): the engine
    switches to the (pos, sid) wide index -- single-device and mesh runs
    agree."""
    # 100 bp: short reads (e.g. 16 bp) can never pass the e-value gate
    # (max raw score 4L < the ~230-point threshold), so capacity tests
    # need realistic lengths for accepts to exist.
    q_codes, db_codes = planted_pair(WIDE_N, 400, 100, seed=6)
    q = batch_seqinfo(q_codes)
    db = batch_seqinfo(db_codes)

    eng1 = TpuEngine(db, Config(mesh_shape=None))
    assert not eng1._packed_idx  # wide regime engaged
    res1 = eng1.compare(q)
    assert res1.accepted >= 200  # planted exact copies

    eng = TpuEngine(db, Config(mesh_shape=(2, 4)))
    res = eng.compare(q)
    assert res.pairs == res1.pairs


def test_wide_query_regime_beyond_2pow20():
    """Query past the packed boundary: read id and qoff no longer share
    one word; the wide candidate format runs single-device and through
    the mesh wide gate step with identical accepts."""
    rng = np.random.default_rng(7)
    db_codes = rng.integers(0, 4, (2000, 100), dtype=np.uint8)
    q_codes = rng.integers(0, 4, (WIDE_N, 100), dtype=np.uint8)
    q_codes[:: WIDE_N // 400][:400] = db_codes[:400]  # planted exact copies
    q = batch_seqinfo(q_codes)
    db = batch_seqinfo(db_codes)

    eng1 = TpuEngine(db, Config(mesh_shape=None))
    res1 = eng1.compare(q)
    assert res1.accepted > 0  # some db reads are copies of query reads

    eng = TpuEngine(db, Config(mesh_shape=(2, 4)))
    res = eng.compare(q)
    assert res.pairs == res1.pairs
