"""Device-side candidate enumeration (ops/enum_gate.py) parity.

The enum gate must reproduce the host candidate stream bit-for-bit: same
triples (read, index hit, qoff) in the same order (reference worker walk,
src/alignmentFunctions.c:91-186, including the boundary-base quirk
SURVEY.md 6.5 and the n_threads split), and therefore identical engine
verdicts and reports."""

import random
from pathlib import Path

import numpy as np
import pytest

from imsame_tpu import native
from imsame_tpu.config import Config
from imsame_tpu.io.fasta import read_fasta
from imsame_tpu.pipeline import TpuEngine
from util_synth import (
    make_pair,
    parse_reference_summary,
    reference_binaries,
    run_reference,
)


def test_enum_engine_parity_vs_reference(tmp_path):
    """Single-device engine (enum auto-on) vs the reference binary."""
    ref = reference_binaries()
    if ref is None:
        pytest.skip("reference binaries unavailable")
    rng = random.Random(31)
    qp, dp = make_pair(
        tmp_path, rng, n_query=40, n_db=40, read_len=150, sub_rate=0.06,
        indel_rate=0.02,
    )
    ref_out = tmp_path / "ref.align"
    stdout = run_reference(ref[0], qp, dp, ref_out, n_threads=1)
    accepted_ref, _, _ = parse_reference_summary(stdout)
    q = read_fasta(str(qp))
    eng = TpuEngine(read_fasta(str(dp)), Config(mesh_shape=None, gate_enum=True))
    assert eng._use_enum
    res = eng.compare(q)
    assert res.accepted == accepted_ref
    assert eng.render_report(q, res) == ref_out.read_bytes()


def test_enum_matches_host_gate_threads4(tmp_path):
    """Enum vs host-candidate engines must agree exactly under the
    n_threads=4 stream-split quirk (thread-first reads lose the previous
    read's trailing base)."""
    rng = random.Random(33)
    qp, dp = make_pair(
        tmp_path, rng, n_query=50, n_db=50, read_len=140, sub_rate=0.05,
        indel_rate=0.03,
    )
    q = read_fasta(str(qp))
    db = read_fasta(str(dp))
    eng_e = TpuEngine(db, Config(mesh_shape=None, n_threads=4, gate_enum=True))
    eng_h = TpuEngine(
        db, Config(mesh_shape=None, n_threads=4, gate_enum=False)
    )
    assert eng_e._use_enum and not eng_h._use_enum
    res_e = eng_e.compare(q)
    res_h = eng_h.compare(q)
    assert res_e.pairs == res_h.pairs
    assert eng_e.render_report(q, res_e) == eng_h.render_report(q, res_h)


def test_enum_candidates_match_host_triples(tmp_path):
    """Device-enumerated (rid, hit, qoff) triples == host build_flat for a
    mixed rank window, incl. boundary-base and ragged read lengths."""
    from imsame_tpu.ops.enum_gate import enum_candidates_debug, enum_select_prefix

    rng = random.Random(35)
    qp, dp = make_pair(
        tmp_path, rng, n_query=60, n_db=60, read_len=150, sub_rate=0.05,
        indel_rate=0.04,
    )
    q = read_fasta(str(qp))
    eng = TpuEngine(read_fasta(str(dp)), Config(mesh_shape=None, gate_enum=True))
    assert eng._use_enum
    eng.compare(q)  # builds _enum_state + host tables

    kp, K_off, lo, cnt, Ccum, C_off = eng._kmer_stream(q)
    N_r = C_off[1:] - C_off[:-1]
    n = q.n_seqs
    q_start = q.start.astype(np.int64)

    # rank window: full stream for even reads, ranks [3, N_r) for odd
    frm = np.where(np.arange(n) % 2 == 0, 0, 3).astype(np.int64)
    to = N_r.astype(np.int64)
    read_ids = np.arange(n, dtype=np.int64)
    sel = np.maximum(np.minimum(to, N_r) - np.minimum(frm, N_r), 0)
    N = int(sel.sum())

    # host triples via the native/vectorized expansion
    arrs = native.build_flat_arrays(
        read_ids, frm, to, K_off, C_off, kp, lo, cnt, Ccum, q_start,
        12, N,
    )
    assert arrs is not None
    h_rids, h_hits, h_qoffs = arrs

    # device triples
    lo_g, cnt_g, Rcum, d_hasb, _ = eng._enum_state
    R = lo_g.shape[0]
    frm_p = np.zeros(R, np.int32)
    to_p = np.zeros(R, np.int32)
    frm_p[:n] = frm
    to_p[:n] = to
    import jax.numpy as jnp

    scum, start_off = enum_select_prefix(
        cnt_g, Rcum, jnp.asarray(frm_p), jnp.asarray(to_p)
    )
    chunk = 1 << (int(N - 1).bit_length())
    d_r, d_hit, d_qoff = enum_candidates_debug(
        lo_g, scum, start_off, d_hasb, np.int32(0),
        chunk=chunk, row_len=eng._row_len,
    )
    np.testing.assert_array_equal(np.asarray(d_r)[:N], h_rids)
    np.testing.assert_array_equal(np.asarray(d_hit)[:N], h_hits)
    np.testing.assert_array_equal(np.asarray(d_qoff)[:N], h_qoffs)
