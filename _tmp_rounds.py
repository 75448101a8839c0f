import numpy as np, time
import bench as B
from imsame_tpu.config import Config
from imsame_tpu.pipeline import TpuEngine

n=20000
qc, dbc = B.synth_pair(n, 250, 0.5, seed=12345)
q = B.codes_to_seqinfo(qc); db = B.codes_to_seqinfo(dbc)
eng = TpuEngine(db, Config())
kp, K_off, lo, cnt, Ccum, C_off = eng._kmer_stream(q)
N_r = (C_off[1:] - C_off[:-1])
print("N_r: mean", N_r.mean(), "median", np.median(N_r), "p90", np.percentile(N_r,90),
      "p99", np.percentile(N_r,99), "max", N_r.max())
print("reads with N_r>8:", (N_r>8).sum(), "  >8+768:", (N_r>776).sum(),
      ">8+768+8192:", (N_r>8968).sum(), ">8+768+3*8192:", (N_r>8+768+3*8192).sum())
# how much candidate mass beyond rank 8 for 'true pair' reads we never need?
