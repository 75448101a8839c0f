import time, functools, numpy as np, jax, jax.numpy as jnp
from imsame_tpu.ops.extend_packed import _window_words, BASES_PER_WORD, SEED_SCORE
from imsame_tpu.constants import POINT, FIXED_K

rng = np.random.default_rng(0)
def timeit(fn, n=6):
    fn()
    t0 = time.perf_counter()
    for _ in range(n): fn()
    return (time.perf_counter()-t0)/n

nq = 32768
qp = jnp.asarray(rng.integers(0, 2**32, (nq, 16), dtype=np.uint64).astype(np.uint32))
N = 1 << 19
r = jnp.asarray(rng.integers(0, 20000, N).astype(np.int32))
s = jnp.asarray(rng.integers(0, 20000, N).astype(np.int32))
qoff = jnp.asarray(rng.integers(12, 250, N).astype(np.int32))
doff = jnp.asarray(rng.integers(12, 250, N).astype(np.int32))
W = 32
EW = (2*W+32)//BASES_PER_WORD

@functools.partial(jax.jit, static_argnames=())
def stage_gather(qp, r, s, qoff, doff):
    ws_q = qoff - (W + 16); ws_d = doff - (W + 16)
    qw = _window_words(qp.reshape(-1), r, 16, ws_q, EW)
    dw = _window_words(qp.reshape(-1), s, 16, ws_d, EW)
    return jnp.sum(qw ^ dw, axis=1)

@functools.partial(jax.jit, static_argnames=())
def stage_match(qp, r, s, qoff, doff):
    ws_q = qoff - (W + 16); ws_d = doff - (W + 16)
    qw = _window_words(qp.reshape(-1), r, 16, ws_q, EW)
    dw = _window_words(qp.reshape(-1), s, 16, ws_d, EW)
    m = ~(qw ^ dw)
    m2 = m & (m >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    bitpos = (2*jnp.arange(16, dtype=jnp.uint32))[None,None,:]
    matchall = ((m2[:,:,None] >> bitpos) & jnp.uint32(1)).astype(jnp.bool_).reshape(N, EW*16)
    return jnp.sum(matchall, axis=1)

@functools.partial(jax.jit, static_argnames=())
def stage_scan(qp, r, s, qoff, doff):
    ws_q = qoff - (W + 16); ws_d = doff - (W + 16)
    qw = _window_words(qp.reshape(-1), r, 16, ws_q, EW)
    dw = _window_words(qp.reshape(-1), s, 16, ws_d, EW)
    m = ~(qw ^ dw)
    m2 = m & (m >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    bitpos = (2*jnp.arange(16, dtype=jnp.uint32))[None,None,:]
    matchall = ((m2[:,:,None] >> bitpos) & jnp.uint32(1)).astype(jnp.bool_).reshape(N, EW*16)
    fwd = matchall[:, W+16:2*W+16]
    o = jnp.arange(W, dtype=jnp.int32)[None,:]
    pm = jnp.where(fwd, POINT, -POINT)
    S = SEED_SCORE + jnp.cumsum(pm, axis=1)
    return jnp.max(S, axis=1)

for name, fn in (("gather+xor", stage_gather), ("..+unpack", stage_match), ("..+1 scan", stage_scan)):
    t = timeit(lambda: jax.device_get(fn(qp, r, s, qoff, doff)))
    print(f"{name:12s} {t*1e3:7.1f} ms  {N/t/1e6:6.2f} Mcand/s")
