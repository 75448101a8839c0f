import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
n=32768; L=256; B=2048
mat = jnp.asarray(rng.integers(0,4,(n,L),dtype=np.uint8))
ridx = jnp.asarray(rng.integers(0,20000,B).astype(np.int32))
g = jax.jit(lambda m, i: m[i])
_ = np.asarray(g(mat, ridx))
t0=time.perf_counter()
for _ in range(5): _ = np.asarray(g(mat, ridx))
print(f"byte row gather+fetch: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
# gather only (no fetch): chain into a sum
g2 = jax.jit(lambda m, i: m[i].astype(jnp.int32).sum())
_ = np.asarray(g2(mat, ridx))
t0=time.perf_counter()
for _ in range(5): _ = np.asarray(g2(mat, ridx))
print(f"byte row gather+sum: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
from imsame_tpu.ops.resolve import unpack_rows
from imsame_tpu.ops.extend_packed import pack_read_rows
codes = rng.integers(0,4,20000*250,dtype=np.uint8)
qp = jnp.asarray(pack_read_rows(codes, np.arange(20000,dtype=np.int64)*250, np.full(20000,250,np.int64), 256))
u2 = jax.jit(lambda qp, i: unpack_rows(qp, i, 256).astype(jnp.int32).sum())
_ = np.asarray(u2(qp, ridx))
t0=time.perf_counter()
for _ in range(5): _ = np.asarray(u2(qp, ridx))
print(f"unpack+sum: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
