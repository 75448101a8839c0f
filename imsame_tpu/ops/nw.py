"""Batched anti-diagonal wavefront formulation of the reference aligner.

The reference computes the DP row-major with two running trackers: a row
maximum ``mf`` and per-column maxima ``mc`` used for "long gap" moves
(src/alignmentFunctions.c:389-489).  All four score reads of cell (i, j)
live on anti-diagonals d-2 and d-3 (d = i+j):

    T[i-1][j-1]  diag d-2   (diagonal move)
    T[i][j-2]    diag d-2   (mf compare quirk, SURVEY.md 6.3)
    T[i-1][j-2]  diag d-3   (mf assign quirk)
    T[i-2][j-1]  diag d-3   (mc update, SURVEY.md 6.4)

and the mf/mc trackers advance exactly once per (row, diagonal) /
(column, diagonal), so the whole recurrence -- quirks included -- maps onto
a wavefront with carried per-row MF and per-column MC state vectors.  Cells
of one anti-diagonal touch distinct rows and distinct columns, so the
per-diagonal update is embarrassingly parallel across both the diagonal and
the batch.

This module is the pure-jnp implementation (runs on CPU and TPU and serves
as the reference for the Pallas kernel in nw_pallas.py).  Backpointers are
stored in *diagonal layout*: bp[b, d, i] = xfrom * 4096 + yfrom for the cell
(i, d-i), or -1 outside the matrix; the traceback reads bp[b, px+py, px].

Tie-breaking parity: the reference picks the best cell by scanning the last
row/column in row-major order with ``>=`` (src/alignmentFunctions.c:481-484),
i.e. the lexicographic max of (score, i, j); we reproduce that with a packed
(score, i) reduction per diagonal plus an (score, i) comparison across
diagonals (same i on a later diagonal implies larger j).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import POINT

NEG = jnp.int32(-(2**28))  # "minus infinity" safe against int32 overflow
PACK = 4096  # coordinate packing base; MAX_READ_SIZE=3000 < 4096


class NWResult(NamedTuple):
    bp: jax.Array  # [B, 2L-1, L] int32, xfrom*4096+yfrom, -1 = no cell
    best_score: jax.Array  # [B] int32
    best_i: jax.Array  # [B] int32
    best_j: jax.Array  # [B] int32


@functools.partial(jax.jit, static_argnames=("max_len",))
def nw_forward_batch(
    X: jax.Array,  # [B, L] uint8 codes, padded
    Y: jax.Array,  # [B, L] uint8 codes, padded
    xlen: jax.Array,  # [B] int32 actual db-read lengths (>= 2)
    ylen: jax.Array,  # [B] int32 actual query-read lengths (>= 2)
    igap: jax.Array,  # scalar int32 (negative)
    egap: jax.Array,  # scalar int32 (negative)
    *,
    max_len: int,
) -> NWResult:
    B, L = X.shape
    assert L == max_len
    ND = 2 * L - 1
    i_idx = jnp.arange(L, dtype=jnp.int32)  # row index along a diagonal
    xlen = xlen.astype(jnp.int32)[:, None]
    ylen = ylen.astype(jnp.int32)[:, None]
    igap = jnp.asarray(igap, jnp.int32)
    egap = jnp.asarray(egap, jnp.int32)

    Xc = X.astype(jnp.int32)

    def body(d, carry):
        (s1, s2, s3, mf_s, mf_x, mf_y, mc_s, mc_x, bs, bi, bj, bp) = carry
        d = jnp.int32(d)
        j_idx = d - i_idx  # [L] column per row on this diagonal
        on_diag = (j_idx >= 0) & (j_idx < L)
        valid = on_diag & (i_idx[None, :] < xlen) & (j_idx[None, :] < ylen)

        jc = jnp.clip(j_idx, 0, L - 1)
        y_c = jnp.take(Y, jc, axis=1).astype(jnp.int32)  # [B, L]
        s_pm = jnp.where(Xc == y_c, POINT, -POINT)  # [B, L]

        # Shifted reads of prior diagonals (index by row i).
        def shift1(a):  # a[:, i-1]
            return jnp.concatenate([jnp.full((B, 1), NEG), a[:, :-1]], axis=1)

        t_im1_jm1 = shift1(s2)
        t_i_jm2 = s2
        t_im1_jm2 = shift1(s3)
        t_im2_jm1 = shift1(shift1(s3))

        inner = valid & (i_idx >= 1) & (j_idx >= 1)

        # --- mf update (before the cell), rows with j > 1 ---
        mf_upd = valid & (i_idx >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
        mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
        mf_x = jnp.where(mf_upd, i_idx - 1, mf_x)
        mf_y = jnp.where(mf_upd, j_idx - 2, mf_y)

        # --- cell scores ---
        score_diag = t_im1_jm1 + s_pm
        score_left = jnp.where(
            j_idx >= 2,
            mf_s + igap + (j_idx - (mf_y + 1)) * egap + s_pm,
            NEG,
        )
        col = jnp.clip(j_idx - 1, 0, L - 1)
        mc_s_at = jnp.take_along_axis(mc_s, jnp.broadcast_to(col, (B, L)), axis=1)
        mc_x_at = jnp.take_along_axis(mc_x, jnp.broadcast_to(col, (B, L)), axis=1)
        score_right = jnp.where(
            i_idx >= 2,
            mc_s_at + igap + (i_idx - (mc_x_at + 1)) * egap + s_pm,
            NEG,
        )

        pick_diag = (score_diag >= score_left) & (score_diag >= score_right)
        pick_right = (~pick_diag) & (score_right > score_left)
        cell = jnp.where(
            pick_diag, score_diag, jnp.where(pick_right, score_right, score_left)
        )
        xfrom = jnp.where(
            pick_diag, i_idx - 1, jnp.where(pick_right, mc_x_at, mf_x)
        )
        yfrom = jnp.where(
            pick_diag, j_idx - 1, jnp.where(pick_right, j_idx - 1, mf_y)
        )

        # Border cells (i==0 or j==0) score +/-POINT with no gap moves.
        border = valid & ((i_idx == 0) | (j_idx == 0))
        cell = jnp.where(border, s_pm, cell)
        s0 = jnp.where(valid, cell, NEG)

        # --- mc update (after the cell), strict >, from two rows up ---
        mc_upd = inner & (j_idx >= 2) & (i_idx >= 2) & (t_im2_jm1 > mc_s_at)
        new_mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s_at)
        new_mc_x = jnp.where(mc_upd, i_idx - 2, mc_x_at)
        # scatter back to distinct columns; out-of-range j-1 dropped
        mc_s = mc_s.at[:, j_idx - 1].set(new_mc_s, mode="drop")
        mc_x = mc_x.at[:, j_idx - 1].set(new_mc_x, mode="drop")

        # --- mf/mc inits from this diagonal's border cells ---
        # column-0 cell (d, 0): mf re-init for row d (src/:426-429)
        col0_ok = (d < L) & (jnp.squeeze(xlen, -1) > d)
        col0_score = s0[:, jnp.clip(d, 0, L - 1)]
        dd = jnp.clip(d, 0, L - 1)
        mf_s = mf_s.at[:, dd].set(jnp.where(col0_ok, col0_score, mf_s[:, dd]))
        mf_x = mf_x.at[:, dd].set(jnp.where(col0_ok, d, mf_x[:, dd]))
        mf_y = mf_y.at[:, dd].set(jnp.where(col0_ok, 0, mf_y[:, dd]))
        # row-0 cell (0, d): mc init for column d (src/:404-413)
        row0_ok = (d < L) & (jnp.squeeze(ylen, -1) > d)
        row0_score = s0[:, 0]
        mc_s = mc_s.at[:, dd].set(jnp.where(row0_ok, row0_score, mc_s[:, dd]))
        mc_x = mc_x.at[:, dd].set(jnp.where(row0_ok, 0, mc_x[:, dd]))

        # --- best cell on last row/column, reference tie-break ---
        elig = inner & ((i_idx == xlen - 1) | (j_idx == ylen - 1))
        packed = jnp.where(elig, s0 * 8192 + i_idx, jnp.int32(-(2**31) + 1))
        dbest = jnp.max(packed, axis=1)
        any_elig = jnp.any(elig, axis=1)
        ds = jnp.floor_divide(dbest, 8192)
        di = dbest - ds * 8192
        take = any_elig & ((ds > bs) | ((ds == bs) & (di >= bi)))
        bs = jnp.where(take, ds, bs)
        bi = jnp.where(take, di, bi)
        bj = jnp.where(take, d - di, bj)

        # --- backpointers for this diagonal ---
        bp_d = jnp.where(inner, xfrom * PACK + yfrom, jnp.int32(-1))
        bp = jax.lax.dynamic_update_slice(bp, bp_d[:, None, :], (0, d, 0))

        # Rotate: next step's (d-1, d-2, d-3) = (this d, this d-1, this d-2).
        return (s0, s1, s2, mf_s, mf_x, mf_y, mc_s, mc_x, bs, bi, bj, bp)

    z = lambda: jnp.full((B, L), NEG, jnp.int32)
    zi = lambda: jnp.zeros((B, L), jnp.int32)
    init = (
        z(),  # s1: diag d-1 (scores unused directly, passed through)
        z(),  # s2: diag d-2
        z(),  # s3: diag d-3
        z(),  # mf_s
        zi(),  # mf_x
        zi(),  # mf_y
        z(),  # mc_s
        zi(),  # mc_x
        jnp.full((B,), jnp.int32(-(2**31) + 1)),  # best score
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B, ND, L), -1, jnp.int32),  # bp
    )
    # Carry rotation: we only ever need diagonals d-2 and d-3, so the carry
    # keeps (spare, s2, s3); body returns (old_s3_as_spare, new, old_s2).
    out = jax.lax.fori_loop(0, ND, body, init)
    (_, _, _, _, _, _, _, _, bs, bi, bj, bp) = out
    return NWResult(bp=bp, best_score=bs, best_i=bi, best_j=bj)
