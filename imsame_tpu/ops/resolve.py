"""Fused gapped-alignment resolve step: row gather -> NW -> traceback.

One jit per pair chunk: the host ships only the pair index vectors
(qread, dbread); the kernel gathers the 2-bit-packed read rows already
resident on device, unpacks them to code matrices, runs the wavefront
aligner (ops/nw_pallas.py on TPU, ops/nw.py elsewhere) and the batched
traceback, and returns per-pair stats plus the traceback chain.  This
keeps host->device traffic per alignment at 8 bytes instead of 2*L.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .extend_packed import BASES_PER_WORD
from .nw import nw_forward_batch, nw_stats_batch
from .nw_pallas import (
    BBLK,
    PIPE2_K,
    PIPE_K,
    RBLK2,
    nw_forward_batch_pallas,
    nw_forward_batch_pallas_pipe5,
    nw_stats_batch_pallas,
    nw_stats_batch_pallas_pipe,
    nw_stats_batch_pallas_pipe3,
    nw_stats_batch_pallas_pipe4,
)

from .traceback import (
    TracebackResult,
    traceback_batch,
    traceback_batch_stream,
)

# v4 multi-block interleave variant per length bucket (measured on TPU
# v5e, bit-equal; nw_pallas._make_nw_stats_pipe4_kernel).  Wider/more
# blocks win where VMEM allows: at L=256 the 2x64 layout lifts the
# kernel 16.7 -> 25.3 GCUPS; at L >= 1024 the wavefront is already
# lane-saturated so v4 ~ties v3 (26-28 GCUPS) and larger layouts exceed
# the 16 MB scoped-VMEM limit (2x64 fails to compile at 1024, 2x32 at
# 2048) -- buckets past 1024 stay on the v3 kernel.
PIPE4_VARIANTS = {256: (2, 64), 512: (2, 64), 1024: (2, 32)}


def unpack_rows(packed: jax.Array, idx: jax.Array, L: int) -> jax.Array:
    """Gather packed rows by index and unpack to [B, L] uint8 codes."""
    wp = L // BASES_PER_WORD
    rows = packed[idx][:, :wp]  # [B, wp] uint32
    shifts = (2 * jnp.arange(BASES_PER_WORD, dtype=jnp.uint32))[None, None, :]
    codes = (rows[:, :, None] >> shifts) & jnp.uint32(3)
    return codes.reshape(idx.shape[0], L).astype(jnp.uint8)


class ResolveNWResult(NamedTuple):
    length: jax.Array  # [B] int32
    identities: jax.Array  # [B] int32
    ylen: jax.Array  # [B] int32
    n_steps: jax.Array  # [B] int32
    chain: jax.Array  # [B, 2L] int32 (device; fetched lazily per accept)


@functools.partial(jax.jit, static_argnames=("max_len", "use_pallas"))
def nw_traceback_rows(
    qp: jax.Array,  # [n_q, WPq] uint32 packed query rows
    dp: jax.Array,  # [n_db, WPd] uint32 packed db rows
    r: jax.Array,  # [B] int32 query read ids (padded entries repeat 0)
    s: jax.Array,  # [B] int32 db read ids
    qlen: jax.Array,  # [n_q] int32
    dlen: jax.Array,  # [n_db] int32
    igap,
    egap,
    *,
    max_len: int,
    use_pallas: bool,
) -> ResolveNWResult:
    X = unpack_rows(dp, s, max_len)
    Y = unpack_rows(qp, r, max_len)
    xl = dlen[s]
    yl = qlen[r]
    B = r.shape[0]
    if use_pallas and B % (RBLK2 * PIPE2_K) == 0 and max_len % 8 == 0:
        # streamed forward+bp kernel (v3-architecture; ~2x the v1 forward
        # kernel, and the stream bp layout halves bp HBM) + the matching
        # stream-indexed traceback.
        bp, bs, bi, bj = nw_forward_batch_pallas_pipe5(
            X, Y, xl, yl, igap, egap, max_len=max_len
        )
        tb: TracebackResult = traceback_batch_stream(
            bp, bi, bj, X, Y, max_len=max_len, stream_k=PIPE2_K
        )
    else:
        nw_fn = nw_forward_batch_pallas if use_pallas else nw_forward_batch
        res = nw_fn(X, Y, xl, yl, igap, egap, max_len=max_len)
        tb = traceback_batch(
            res.bp, res.best_i, res.best_j, X, Y, max_len=max_len
        )
    return ResolveNWResult(
        length=tb.length,
        identities=tb.identities,
        ylen=yl.astype(jnp.int32),
        n_steps=tb.n_steps,
        chain=tb.chain,
    )


@functools.partial(jax.jit, static_argnames=("max_len", "use_pallas", "pipe"))
def nw_stats_rows(
    qp: jax.Array,  # [n_q, WPq] uint32 packed query rows
    dp: jax.Array,  # [n_db, WPd] uint32 packed db rows
    rs: jax.Array,  # [2, B] int32: row 0 query read ids, row 1 db read ids
    qlen: jax.Array,  # [n_q] int32
    dlen: jax.Array,  # [n_db] int32
    igap,
    egap,
    *,
    max_len: int,
    use_pallas: bool,
    pipe: bool = False,
) -> jax.Array:
    """Accept-gate resolve: gather packed rows, run the stats-only wavefront
    aligner (no backpointer tensor -- the round-1 HBM-bandwidth ceiling),
    return exactly what the accept gate needs (reference accept:
    src/alignmentFunctions.c:163) as one stacked [3, B] int32 array
    (length, identities, ylen) -- a single transfer each way per chunk,
    since behind a tunneled TPU every buffer costs a round trip.  The
    traceback chain for *accepted* pairs is produced later by
    nw_traceback_rows at render time."""
    r = rs[0]
    s = rs[1]
    X = unpack_rows(dp, s, max_len)
    Y = unpack_rows(qp, r, max_len)
    xl = dlen[s]
    yl = qlen[r]
    B = r.shape[0]
    v4 = PIPE4_VARIANTS.get(max_len)
    if (
        use_pallas and pipe and v4 is not None
        and B % (v4[0] * v4[1] * PIPE2_K) == 0
        and max_len % 8 == 0
    ):
        nw_fn = functools.partial(
            nw_stats_batch_pallas_pipe4, n_blk=v4[0], rblk=v4[1]
        )
    elif (
        use_pallas and pipe and B % (RBLK2 * PIPE2_K) == 0
        and max_len % 8 == 0
    ):
        # v3 registerized pipelined kernel (nw_pallas.py
        # _make_nw_stats_pipe3_kernel; 16.2 vs the v2 kernel's 8.3 GCUPS
        # measured on TPU v5e, bit-equal).
        nw_fn = nw_stats_batch_pallas_pipe3
    elif use_pallas and pipe and B % (BBLK * PIPE_K) == 0 and max_len % 8 == 0:
        # Pipelined kernel: K pairs streamed per sublane row at ~full lane
        # occupancy, ~1.8x fewer wavefront steps (nw_pallas.py
        # _make_nw_stats_pipe_kernel).  Bit-equal to the plain kernels;
        # batches too small to stream K pairs per row fall through.
        nw_fn = nw_stats_batch_pallas_pipe
    elif use_pallas:
        nw_fn = nw_stats_batch_pallas
    else:
        nw_fn = nw_stats_batch
    res = nw_fn(X, Y, xl, yl, igap, egap, max_len=max_len)
    return jnp.stack(
        [res.length, res.identities, yl.astype(jnp.int32)]
    )
