import time, numpy as np, jax.numpy as jnp
from imsame_tpu.ops.resolve import nw_traceback_rows
from imsame_tpu.ops.extend_packed import pack_read_rows
rng = np.random.default_rng(0)
n=20000; L=250; W=256; B=2048
codes = rng.integers(0,4,n*L,dtype=np.uint8)
start = np.arange(n,dtype=np.int64)*L; lens = np.full(n,L,np.int64)
qp = jnp.asarray(pack_read_rows(codes,start,lens,W))
r = jnp.asarray(rng.integers(0,n,B).astype(np.int32))
s = jnp.asarray(rng.integers(0,n,B).astype(np.int32))
ql = jnp.asarray(np.full(n,L,np.int32))
res = nw_traceback_rows(qp,qp,r,s,ql,ql,-5,-2,max_len=W,use_pallas=True)
_ = np.asarray(res.length)
t0=time.perf_counter(); it=5
for _ in range(it):
    res = nw_traceback_rows(qp,qp,r,s,ql,ql,-5,-2,max_len=W,use_pallas=True)
    _ = np.asarray(res.length); _ = np.asarray(res.identities); _ = np.asarray(res.ylen); _ = np.asarray(res.n_steps)
dt=(time.perf_counter()-t0)/it
print(f"nw_traceback_rows B={B}: {dt*1e3:.1f} ms  ({B*250*250/dt/1e9:.2f} GCUPS incl tb)")
