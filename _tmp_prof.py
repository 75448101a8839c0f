import time, sys, cProfile, pstats
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import synth_pair, codes_to_seqinfo
from imsame_tpu.config import Config
from imsame_tpu.pipeline import TpuEngine
qc, dbc = synth_pair(2000, 250, 0.5, seed=12345)
q = codes_to_seqinfo(qc); db = codes_to_seqinfo(dbc)
eng = TpuEngine(db, Config())
eng.compare(codes_to_seqinfo(qc[:256]))
eng.compare(q)
pr = cProfile.Profile(); pr.enable()
r = eng.compare(q)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
