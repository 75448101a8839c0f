import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import synth_pair, codes_to_seqinfo
from imsame_tpu.config import Config
from imsame_tpu.pipeline import TpuEngine

qc, dbc = synth_pair(2000, 250, 0.5, seed=12345)
q = codes_to_seqinfo(qc); db = codes_to_seqinfo(dbc)
eng = TpuEngine(db, Config())
t0=time.perf_counter(); r=eng.compare(codes_to_seqinfo(qc[:256])); print("warm", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter(); r=eng.compare(q); print("full1", round(time.perf_counter()-t0,2), flush=True)
eng.timer.reset()
t0=time.perf_counter(); r=eng.compare(q); dt=time.perf_counter()-t0
print("full2", round(dt,3), "reads/s", round(2000/dt), flush=True)
print("timings", {k: round(v,3) for k,v in r.timings.items()}, flush=True)
# bigger: 8000 reads in same process (shapes: A_pad 8192)
qc2, dbc2 = synth_pair(8000, 250, 0.5, seed=999)
q2 = codes_to_seqinfo(qc2); db2 = codes_to_seqinfo(dbc2)
eng2 = TpuEngine(db2, Config())
t0=time.perf_counter(); r2=eng2.compare(q2); print("8k-1", round(time.perf_counter()-t0,2), r2.accepted, flush=True)
eng2.timer.reset()
t0=time.perf_counter(); r2=eng2.compare(q2); dt=time.perf_counter()-t0
print("8k-2", round(dt,2), "reads/s", round(8000/dt), flush=True)
print("timings", {k: round(v,3) for k,v in r2.timings.items()}, flush=True)
