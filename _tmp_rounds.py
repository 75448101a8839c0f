import time, sys, os
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import synth_pair, codes_to_seqinfo
from imsame_tpu.config import Config
import imsame_tpu.pipeline as P
import jax, jax.numpy as jnp

# monkeypatch candidate_round call site timing
orig = P.candidate_round
def timed_round(tables, act, g, rv, *, R, window):
    t0 = time.perf_counter()
    rr = orig(tables, act, g, rv, R=R, window=window)
    jax.block_until_ready(rr.passes)
    t1 = time.perf_counter()
    p = np.asarray(rr.passes)
    t2 = time.perf_counter()
    s = np.asarray(rr.sid)
    t3 = time.perf_counter()
    print(f"  round A={act.shape[0]}: compute {t1-t0:.3f}s  passes {t2-t1:.3f}s  sid {t3-t2:.3f}s", flush=True)
    class RR: passes = rr.passes; sid = rr.sid
    return rr
P.candidate_round = timed_round

qc, dbc = synth_pair(8000, 250, 0.5, seed=999)
q = codes_to_seqinfo(qc); db = codes_to_seqinfo(dbc)
eng = P.TpuEngine(db, Config())
for it in range(2):
    t0 = time.perf_counter()
    r = eng.compare(q)
    print(f"compare{it}: {time.perf_counter()-t0:.2f}s", flush=True)
    print("timings", {k: round(v,3) for k,v in r.timings.items()}, flush=True)
    eng.timer.reset()
