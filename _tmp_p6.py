import time, numpy as np, jax, jax.numpy as jnp
from imsame_tpu.ops.extend_packed import extend_packed, pack_read_rows
rng = np.random.default_rng(0)
n_reads = 20000; L = 250; W = 256
codes = rng.integers(0,4, n_reads*L, dtype=np.uint8)
start = np.arange(n_reads, dtype=np.int64)*L
lens = np.full(n_reads, L, np.int64)
qp = jnp.asarray(pack_read_rows(codes, start, lens, W))
for N in (65536, 8192*56):
    r = jnp.asarray(rng.integers(0, n_reads, N).astype(np.int32))
    qoff = jnp.asarray(rng.integers(12, L, N).astype(np.int32))
    ql = jnp.full(N, L, jnp.int32); thr = jnp.full(N, 240, jnp.int32)
    t0=time.perf_counter()
    out = np.asarray(extend_packed(qp, qp, r, r, qoff, qoff, ql, ql, thr, W=W).raw)
    t1=time.perf_counter()
    out = np.asarray(extend_packed(qp, qp, r, r, qoff, qoff, ql, ql, thr, W=W).raw)
    t2=time.perf_counter()
    print(f"N={N}: first(compile+run)={t1-t0:.2f}s warm={t2-t1:.3f}s -> {N/(t2-t1)/1e6:.2f} Mcand/s")
