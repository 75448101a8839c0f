import time, numpy as np, jax, jax.numpy as jnp
from imsame_tpu.ops.nw_pallas import nw_forward_batch_pallas
from imsame_tpu.ops.traceback import traceback_batch
from imsame_tpu.ops.resolve import unpack_rows
from imsame_tpu.ops.extend_packed import pack_read_rows
rng = np.random.default_rng(0)
n=20000; L=250; W=256; B=2048
codes = rng.integers(0,4,n*L,dtype=np.uint8)
start = np.arange(n,dtype=np.int64)*L; lens=np.full(n,L,np.int64)
qp = jnp.asarray(pack_read_rows(codes,start,lens,W))
ridx = jnp.asarray(rng.integers(0,n,B).astype(np.int32))
sidx = jnp.asarray(rng.integers(0,n,B).astype(np.int32))

up = jax.jit(lambda qp, i: unpack_rows(qp, i, W))
X = up(qp, sidx); Y = up(qp, ridx)
_ = np.asarray(X)
t0=time.perf_counter()
for _ in range(5): _ = np.asarray(up(qp, sidx))
print(f"unpack: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

xl = jnp.full(B,250,jnp.int32); yl = jnp.full(B,250,jnp.int32)
res = nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=W)
tb = traceback_batch(res.bp,res.best_i,res.best_j,X,Y,max_len=W)
_ = np.asarray(tb.length)
t0=time.perf_counter()
for _ in range(5):
    tb = traceback_batch(res.bp,res.best_i,res.best_j,X,Y,max_len=W)
    _ = np.asarray(tb.length)
print(f"traceback alone: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
