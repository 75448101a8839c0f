import time, sys
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import synth_pair, codes_to_seqinfo
from imsame_tpu.config import Config
from imsame_tpu.pipeline import TpuEngine, _pow2_pad
from imsame_tpu.ops.candidates import candidate_round

qc, dbc = synth_pair(8000, 250, 0.5, seed=999)
q = codes_to_seqinfo(qc); db = codes_to_seqinfo(dbc)
eng = TpuEngine(db, Config())

# build tables exactly as compare() does
kp, K_off, lo, cnt, Ccum, C_off = eng._kmer_stream(q)
n = q.n_seqs
N_r = (C_off[1:] - C_off[:-1])
import imsame_tpu.pipeline as P
from imsame_tpu.ops.extend import raw_score_threshold
from imsame_tpu.ops.candidates import RoundTables
qlens = q.read_lens()
thr = raw_score_threshold(qlens, db.total_len, 1e-20)
qys, qye = P._read_bounds_ext(q)
i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
cnt_k = (Ccum[1:] - Ccum[:-1]).astype(np.int64)
t_of_gc = np.repeat(np.arange(len(cnt_k), dtype=np.int32), cnt_k)
tables = RoundTables(
    Ccum=i32(Ccum), t_of_gc=i32(t_of_gc), lo=i32(lo), kp=i32(kp),
    C_off=i32(C_off[:n]), N_r=i32(N_r), idx_pos=i32(eng.index.pos),
    idx_sid=i32(eng.index.sid), dxs=i32(eng.dxs), dxe=i32(eng.dxe),
    qys=i32(qys), qye=i32(qye), thr=jnp.asarray(thr),
    db_codes=eng.d_db_codes, q_codes=jnp.asarray(q.codes),
)
print("total candidates:", int(Ccum[-1]), "max N_r:", int(N_r.max()), flush=True)

for A in (8192,):
    act = np.arange(A) % n
    rv = np.ones(A, bool)
    for W in (256,):
        t = time.perf_counter()
        rr = candidate_round(tables, i32(act), i32(np.zeros(A)), jnp.asarray(rv), R=128, window=W)
        jax.block_until_ready(rr.passes)
        print(f"A={A} W={W} compile+run {time.perf_counter()-t:.1f}s", flush=True)
        # warm, device-only (no transfer)
        t = time.perf_counter()
        for _ in range(3):
            rr = candidate_round(tables, i32(act), i32(np.zeros(A)), jnp.asarray(rv), R=128, window=W)
            jax.block_until_ready(rr.passes)
        print(f"  warm device-only: {(time.perf_counter()-t)/3*1000:.0f} ms", flush=True)
        # with transfer
        t = time.perf_counter()
        for _ in range(3):
            rr = candidate_round(tables, i32(act), i32(np.zeros(A)), jnp.asarray(rv), R=128, window=W)
            p = np.asarray(rr.passes); s = np.asarray(rr.sid)
        print(f"  warm with transfer: {(time.perf_counter()-t)/3*1000:.0f} ms", flush=True)
