import time, numpy as np, jax, jax.numpy as jnp

# 1. round-trip latency
x = jnp.zeros(8, jnp.int32)
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0=time.perf_counter()
for _ in range(20):
    f(x).block_until_ready()
print("roundtrip ms:", (time.perf_counter()-t0)/20*1e3)

# host->device transfer of 1MB
h = np.zeros(1<<20, np.uint8)
t0=time.perf_counter()
for _ in range(5):
    jnp.asarray(h).block_until_ready()
print("1MB upload ms:", (time.perf_counter()-t0)/5*1e3)

# 2. extension kernel throughput
from imsame_tpu.ops.extend import extend_batch
rng = np.random.default_rng(0)
Ld = 5_000_000
db = jnp.asarray(rng.integers(0,4,Ld,dtype=np.uint8))
qc = jnp.asarray(rng.integers(0,4,Ld,dtype=np.uint8))
for N in (65536, 1048576):
    pos_db = jnp.asarray(rng.integers(300, Ld-300, N).astype(np.int32))
    pos_q  = jnp.asarray(rng.integers(300, Ld-300, N).astype(np.int32))
    z = jnp.zeros(N, jnp.int32)
    e = jnp.full(N, Ld-1, jnp.int32)
    thr = jnp.full(N, 240, jnp.int32)
    r = extend_batch(db, qc, pos_db, pos_q, z, e, z, e, thr, window=256)
    r.raw.block_until_ready()
    t0=time.perf_counter()
    r = extend_batch(db, qc, pos_db, pos_q, z, e, z, e, thr, window=256)
    r.raw.block_until_ready()
    dt=time.perf_counter()-t0
    print(f"extend N={N}: {dt*1e3:.1f} ms, {N/dt/1e6:.2f} Mcand/s")
