import time, numpy as np, jax, jax.numpy as jnp
from imsame_tpu.ops.extend import extend_batch
rng = np.random.default_rng(0)
Ld = 5_000_000
db = jnp.asarray(rng.integers(0,4,Ld,dtype=np.uint8))
qc = jnp.asarray(rng.integers(0,4,Ld,dtype=np.uint8))
for N in (65536, 262144, 1048576):
    pos_db = jnp.asarray(rng.integers(300, Ld-300, N).astype(np.int32))
    pos_q  = jnp.asarray(rng.integers(300, Ld-300, N).astype(np.int32))
    z = jnp.zeros(N, jnp.int32); e = jnp.full(N, Ld-1, jnp.int32)
    thr = jnp.full(N, 240, jnp.int32)
    _ = np.asarray(extend_batch(db, qc, pos_db, pos_q, z, e, z, e, thr, window=256).raw)
    t0=time.perf_counter(); iters=3
    for _i in range(iters):
        out = np.asarray(extend_batch(db, qc, pos_db, pos_q, z, e, z, e, thr, window=256).raw)
    dt=(time.perf_counter()-t0)/iters
    print(f"extend N={N}: {dt*1e3:.1f} ms, {N/dt/1e6:.2f} Mcand/s, sum={out.sum()}")
