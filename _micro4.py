import time, functools, numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
def timeit(fn, n=6):
    fn()
    t0 = time.perf_counter()
    for _ in range(n): fn()
    return (time.perf_counter()-t0)/n

nq = 32768
WP = 16
qp = jnp.asarray(rng.integers(0, 2**32, (nq, WP), dtype=np.uint64).astype(np.uint32))
N = 1 << 19
r = jnp.asarray(rng.integers(0, 20000, N).astype(np.int32))
s = jnp.asarray(rng.integers(0, 20000, N).astype(np.int32))
qoff = jnp.asarray(rng.integers(12, 250, N).astype(np.int32))
doff = jnp.asarray(rng.integers(12, 250, N).astype(np.int32))
W = 32
EW = (2*W+32)//16

@jax.jit
def rowgather_only(qp, r, s):
    return jnp.sum(qp[r] ^ qp[s], axis=1)

@jax.jit
def rowgather_extract(qp, r, s, qoff, doff):
    # gather whole rows, then extract EW+1 window words by masked reduction
    rq = qp[r]  # [N, WP]
    rd = qp[s]
    lane = jnp.arange(WP, dtype=jnp.int32)[None, :]
    def extract(rows, ws):
        wi0 = (ws >> 4)[:, None]  # first needed word
        outs = []
        for j in range(EW + 1):
            sel = lane == jnp.clip(wi0 + j, 0, WP - 1)
            outs.append(jnp.sum(jnp.where(sel, rows, jnp.uint32(0)), axis=1))
        return jnp.stack(outs, axis=1)  # [N, EW+1]
    ws_q = qoff - (W + 16); ws_d = doff - (W + 16)
    W1q = extract(rq, ws_q); W1d = extract(rd, ws_d)
    def funnel(W1, ws):
        sh = (2 * (ws & 15)).astype(jnp.uint32)[:, None]
        lo = W1[:, :-1]; hi = W1[:, 1:]
        return jnp.where(sh == 0, lo, (lo >> sh) | (hi << (jnp.uint32(32) - sh)))
    return jnp.sum(funnel(W1q, ws_q) ^ funnel(W1d, ws_d), axis=1)

t = timeit(lambda: jax.device_get(rowgather_only(qp, r, s)))
print(f"row gather only   {t*1e3:7.1f} ms  {N/t/1e6:6.2f} Mcand/s")
t = timeit(lambda: jax.device_get(rowgather_extract(qp, r, s, qoff, doff)))
print(f"rowgather+extract {t*1e3:7.1f} ms  {N/t/1e6:6.2f} Mcand/s")
