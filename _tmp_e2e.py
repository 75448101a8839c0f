import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import synth_pair, codes_to_seqinfo
from imsame_tpu.config import Config
from imsame_tpu.pipeline import TpuEngine

qc, dbc = synth_pair(2000, 250, 0.5, seed=12345)
q = codes_to_seqinfo(qc); db = codes_to_seqinfo(dbc)
t0=time.perf_counter(); eng = TpuEngine(db, Config()); print("index", round(time.perf_counter()-t0,3), flush=True)
t0=time.perf_counter(); r=eng.compare(codes_to_seqinfo(qc[:256])); print("warm", round(time.perf_counter()-t0,2), flush=True)
t0=time.perf_counter(); r=eng.compare(q); print("full1", round(time.perf_counter()-t0,2), r.accepted, flush=True)
t0=time.perf_counter(); r=eng.compare(q); dt=time.perf_counter()-t0
print("full2", round(dt,3), "reads/s", round(2000/dt), flush=True)
print("timings", {k: round(v,3) for k,v in r.timings.items()}, flush=True)
