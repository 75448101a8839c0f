"""Device-side candidate expansion + extension gating for one round.

The resolution loop's per-round work -- mapping each active read's next R
candidate ranks to (k-mer slot, bucket offset, index entry), fetching hit
positions, and running the ungapped-extension gate -- is one fused jit
step over device-resident tables.  The host ships only two small arrays
per round (active read ids and their next candidate rank) and receives a
packed pass-bit mask; everything else stays on device.

The extension itself runs on 2-bit-packed read rows (ops/extend_packed.py)
rather than the concatenated byte arrays: per-base random gathers are the
dominant cost on TPU, and the packed form replaces them with two small
word-window gathers per candidate.

Tables (uploaded once per compare):
  Ccum[i]   exclusive cumsum of bucket sizes per k-mer slot (stream order)
  t_of_gc[c] k-mer slot owning global candidate rank c
  lo[i]     index bucket start for slot i
  kp[i]     k-mer start position for slot i
  C_off[r]  first global candidate rank of read r
  N_r[r]    total candidates of read r
  idx_pos/idx_sid   the sorted k-mer index payload
  q_start/db_start  per-read offsets into the concatenated arrays
  qlen/dlen per-read lengths
  qp/dp     packed 2-bit read rows
  thr[r]    per-read integer raw-score threshold (see ops/extend.py)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import FIXED_K
from .extend_packed import extend_packed


class RoundTables(NamedTuple):
    Ccum: jax.Array  # [K+1] int32
    t_of_gc: jax.Array  # [total_c] int32
    lo: jax.Array  # [K] int32
    kp: jax.Array  # [K] int32
    C_off: jax.Array  # [n] int32
    N_r: jax.Array  # [n] int32
    idx_pos: jax.Array  # [N] int32
    idx_sid: jax.Array  # [N] int32
    q_start: jax.Array  # [n] int32
    db_start: jax.Array  # [n_db] int32
    qlen: jax.Array  # [n] int32
    dlen: jax.Array  # [n_db] int32
    qp: jax.Array  # [n, WPq] uint32 packed query rows
    dp: jax.Array  # [n_db, WPd] uint32 packed db rows
    thr: jax.Array  # [n] int32


class RoundResult(NamedTuple):
    pass_bits: jax.Array  # [A, Rp//32] int32 packed pass mask (bit k of word
    # w = candidate slot w*32+k); keeps the per-round device->host transfer
    # tiny -- the host recomputes hit ids from its own copy of the tables.


@functools.partial(jax.jit, static_argnames=("R", "window"))
def candidate_round(
    tables: RoundTables,
    act: jax.Array,  # [A] int32 active read ids (padded rows repeat 0)
    next_g: jax.Array,  # [A] int32 next candidate rank per read
    row_valid: jax.Array,  # [A] bool False for padding rows
    *,
    R: int,
    window: int,
) -> RoundResult:
    A = act.shape[0]
    g = next_g[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :]
    valid = (g < tables.N_r[act][:, None]) & row_valid[:, None]
    total_c = tables.t_of_gc.shape[0]
    gc = jnp.minimum(g + tables.C_off[act][:, None], jnp.maximum(total_c - 1, 0))
    # Rank -> k-mer slot via the precomputed repeat table (a single gather;
    # a binary search here costs ~20 gathers per candidate).
    t = tables.t_of_gc[gc]
    h = gc - tables.Ccum[t]
    hit = jnp.clip(tables.lo[t] + h, 0, jnp.maximum(tables.idx_pos.shape[0] - 1, 0))
    sid = tables.idx_sid[hit].reshape(-1)
    r_ids = act[:, None].repeat(R, 1).reshape(-1)
    doff = (tables.idx_pos[hit].reshape(-1) - tables.db_start[sid])
    qoff = (tables.kp[t].reshape(-1) + FIXED_K) - tables.q_start[r_ids]

    res = extend_packed(
        tables.qp,
        tables.dp,
        r_ids,
        sid,
        qoff,
        doff,
        tables.qlen[r_ids],
        tables.dlen[sid],
        tables.thr[r_ids],
        W=window,
    )
    passes = res.passes.reshape(A, R) & valid
    # pack 32 slots per int32 word (pad R up to a word boundary)
    Rp = ((R + 31) // 32) * 32
    if Rp != R:
        passes = jnp.concatenate(
            [passes, jnp.zeros((A, Rp - R), bool)], axis=1
        )
    bits = passes.reshape(A, Rp // 32, 32).astype(jnp.int32)
    weights = (jnp.int32(1) << jnp.arange(32, dtype=jnp.int32))[None, None, :]
    pass_bits = jnp.sum(bits * weights, axis=2).astype(jnp.int32)
    return RoundResult(pass_bits=pass_bits)
