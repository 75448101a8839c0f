"""Mesh-integrated production engine: the same TpuEngine used single-device
runs sharded over the ('data', 'dict') mesh (conftest provides 8 virtual
CPU devices) and must produce byte-identical reports.

data axis = the reference's pthread split of query work
(src/IMSAME.c:414-462); dict axis = row-range-sharded index payload
(the shared Container, src/alignmentFunctions.h:4-6) with cross-shard hit
retrieval merged by a psum of disjoint pass bits."""

import random

import pytest

from imsame_tpu.config import Config
from imsame_tpu.io.fasta import parse_fasta_bytes
from imsame_tpu.pipeline import TpuEngine
from tests.util_synth import make_pair


def _seqinfos(tmp_path, seed, n=48, read_len=150):
    rng = random.Random(seed)
    qp, dp = make_pair(tmp_path, rng, n_query=n, n_db=n, read_len=read_len,
                       sub_rate=0.05, indel_rate=0.02)
    return parse_fasta_bytes(qp.read_bytes()), parse_fasta_bytes(dp.read_bytes())


def test_auto_mesh_active_with_default_config(tmp_path):
    q, db = _seqinfos(tmp_path, 31)
    eng = TpuEngine(db, Config())
    assert eng._mesh is not None, "8 virtual devices must auto-mesh"
    assert eng._mesh.shape["data"] == 8


def test_mesh_report_byte_identical_to_single_device(tmp_path):
    q, db = _seqinfos(tmp_path, 32)
    eng1 = TpuEngine(db, Config(mesh_shape=None))
    res1 = eng1.compare(q)
    rep1 = eng1.render_report(q, res1)
    assert res1.accepted > 0

    for shape in [(8, 1), (4, 2), (2, 4)]:
        eng = TpuEngine(db, Config(mesh_shape=shape))
        assert eng._mesh is not None
        res = eng.compare(q)
        assert res.pairs == res1.pairs
        rep = eng.render_report(q, res)
        assert rep == rep1, f"mesh {shape} report differs"


def test_mesh_dict_axis_shards_payload(tmp_path):
    # With n_dict=4 each device holds 1/4 of the (pos, sid) payload rows.
    q, db = _seqinfos(tmp_path, 33)
    eng = TpuEngine(db, Config(mesh_shape=(2, 4)))
    n_dict = eng._mesh.shape["dict"]
    assert n_dict == 4
    total = eng._d_idx_tab.shape[0]  # packed one-word payload
    assert eng._shard_rows == total // n_dict
    for s in eng._d_idx_tab.addressable_shards:
        assert s.data.shape[0] == total // n_dict


def test_mesh_rejects_indivisible_batches(tmp_path):
    q, db = _seqinfos(tmp_path, 34, n=8)
    with pytest.raises(ValueError):
        TpuEngine(db, Config(mesh_shape=(8, 1), gate_chunks=(96, 32)))
