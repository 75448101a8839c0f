"""Pallas TPU kernel for the batched wavefront aligner.

Same recurrence and quirk semantics as ops/nw.py (the jnp reference
implementation, validated cell-for-cell against the scalar oracle), but the
carried wavefront state -- three score diagonals, the mf/mc trackers, and
the rotating char feeds -- lives in VMEM scratch for the whole sweep, so
the 2L-1 sequential diagonal steps cost VPU cycles instead of HBM
round-trips.

Structure: the anti-diagonal index d is the *inner grid dimension*
(grid = (pair_blocks, 2L-1)); TPU grids execute sequentially, so VMEM
scratch carries the wavefront state from one diagonal to the next, and the
backpointer output block for step (b, d) is just this diagonal's packed
from-cells -- no dynamic stores and no in-kernel loop (both of which this
toolchain's Mosaic fails to legalize).

Layout: pairs on sublanes (block of 8), the row index i of each
anti-diagonal on lanes; every "previous row" access is a lane-shift
(pltpu.roll + edge fill) and every mc/yd advance a lane-shift with a fresh
value entering at lane 0 (see ops/nw.py for the alignment argument).
Mosaic cannot dynamically index the lane dimension, so the per-diagonal
chars X[d] / Y[d] come from rotating feeds: the reversed sequences are
loaded into VMEM and rolled one lane per step, keeping the needed char at
the static last lane; wrapped chars only feed cells outside the valid
region.

Outputs bit-match ops/nw.py: bp[b, d, i] = xfrom*4096+yfrom (diagonal
layout) and the reference-tie-broken best cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import POINT
from .nw import NWResult, NWStatsResult, PACK, RUN_CAP

NEG = -(2 ** 28)  # python int: pallas kernels cannot capture jax scalars

BBLK = 8  # pairs per grid step (sublane tile)
UNROLL = 8  # diagonals per grid step (bp block sublane tile; amortizes grid
# overhead; 2L diagonals are computed, one past the 2L-1 real ones -- the
# extra is all-invalid and emits -1 rows)


def _make_nw_kernel(max_len: int):
    L = max_len
    ND = 2 * L - 1

    def kernel(igap_ref, egap_ref, x_ref, xr_ref, yr_ref, xlen_ref, ylen_ref,
               bp_ref, bs_ref, bi_ref, bj_ref,
               s1_ref, s2_ref, s3_ref, mfs_ref, mfx_ref, mfy_ref,
               mcs_ref, mcx_ref, yd_ref, xf_ref, yf_ref,
               rn1_ref, rn2_ref, mr1_ref, mr2_ref,
               cbs_ref, cbi_ref, cbj_ref):
        dbase = pl.program_id(1) * jnp.int32(UNROLL)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        xlen = xlen_ref[:]  # (BBLK, 1)
        ylen = ylen_ref[:]
        xc = x_ref[:]  # (BBLK, L) int32 codes
        lane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, L), 1)
        # Explicit int32 literals: under jax_enable_x64 a python-int branch
        # of jnp.where becomes an int64 constant, which Mosaic cannot lower.
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)

        def shift1(a, fill):
            """a'[:, i] = a[:, i-1]; a'[:, 0] = fill."""
            rolled = pltpu.roll(a, jnp.int32(1), axis=1)
            return jnp.where(lane == 0, fill, rolled)

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((BBLK, L), NEG, jnp.int32)
            zero = jnp.zeros((BBLK, L), jnp.int32)
            s1_ref[:] = neg
            s2_ref[:] = neg
            s3_ref[:] = neg
            rn1_ref[:] = zero
            rn2_ref[:] = zero
            mr1_ref[:] = zero
            mr2_ref[:] = zero
            mfs_ref[:] = neg
            mfx_ref[:] = zero
            mfy_ref[:] = zero
            mcs_ref[:] = neg
            mcx_ref[:] = zero
            yd_ref[:] = zero
            xf_ref[:] = xr_ref[:]  # rotating feeds: lane L-1 holds X[d]/Y[d]
            yf_ref[:] = yr_ref[:]
            cbs_ref[:] = jnp.full((BBLK, 1), jnp.int32(-(2**31) + 1))
            cbi_ref[:] = jnp.zeros((BBLK, 1), jnp.int32)
            cbj_ref[:] = jnp.zeros((BBLK, 1), jnp.int32)

        y0 = yr_ref[:, L - 1 : L]  # (BBLK, 1) first query char
        bp_rows = []
        for u in range(UNROLL):
            d = dbase + jnp.int32(u)
            j_idx = d - lane

            # Chars of this diagonal from the rotating feeds: lane L-1 of
            # the reversed buffer holds X[d]/Y[d]; rolling right by one
            # brings X[d+1]/Y[d+1] (at lane L-2) into place for next step.
            y_new = yf_ref[:, L - 1 : L]
            x_at_d = xf_ref[:, L - 1 : L]
            yf_ref[:] = pltpu.roll(yf_ref[:], jnp.int32(1), axis=1)
            xf_ref[:] = pltpu.roll(xf_ref[:], jnp.int32(1), axis=1)
            yd = shift1(yd_ref[:], y_new)
            yd_ref[:] = yd

            valid = (j_idx >= 0) & (lane < xlen) & (j_idx < ylen)
            inner = valid & (lane >= 1) & (j_idx >= 1)
            s_pm = jnp.where(xc == yd, P4, M4)

            s2 = s2_ref[:]
            s3 = s3_ref[:]
            t_im1_jm1 = shift1(s2, NEG32)
            t_i_jm2 = s2
            t_im1_jm2 = shift1(s3, NEG32)
            t_im2_jm1 = shift1(t_im1_jm2, NEG32)

            # mf update (before the cell), j > 1
            mf_s = mfs_ref[:]
            mf_x = mfx_ref[:]
            mf_y = mfy_ref[:]
            mf_upd = valid & (lane >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_x = jnp.where(mf_upd, lane - jnp.int32(1), mf_x)
            mf_y = jnp.where(mf_upd, j_idx - jnp.int32(2), mf_y)

            # cell scores
            mc_s = mcs_ref[:]
            mc_x = mcx_ref[:]
            score_diag = t_im1_jm1 + s_pm
            score_left = jnp.where(
                j_idx >= 2, mf_s + igap + (j_idx - (mf_y + 1)) * egap + s_pm, NEG32
            )
            score_right = jnp.where(
                lane >= 2, mc_s + igap + (lane - (mc_x + 1)) * egap + s_pm, NEG32
            )
            pick_diag = (score_diag >= score_left) & (score_diag >= score_right)
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag, jnp.where(pick_right, score_right, score_left)
            )
            xfrom = jnp.where(
                pick_diag, lane - jnp.int32(1), jnp.where(pick_right, mc_x, mf_x)
            )
            yfrom = jnp.where(
                pick_diag,
                j_idx - jnp.int32(1),
                jnp.where(pick_right, j_idx - jnp.int32(1), mf_y),
            )
            border = valid & ((lane == 0) | (j_idx == 0))
            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)

            # diagonal-run tracking (see ops/nw.py BP word layout)
            match_i = jnp.where(xc == yd, jnp.int32(1), Z32)
            run_prev = shift1(rn2_ref[:], Z32)
            mr_prev = shift1(mr2_ref[:], Z32)
            is_diag = pick_diag & inner
            capped = run_prev == jnp.int32(RUN_CAP)
            run_cur = jnp.where(
                is_diag, jnp.where(capped, jnp.int32(1), run_prev + 1), Z32
            )
            mr_cur = jnp.where(
                is_diag, jnp.where(capped, match_i, mr_prev + match_i), Z32
            )
            rn2_ref[:] = rn1_ref[:]
            rn1_ref[:] = run_cur
            mr2_ref[:] = mr1_ref[:]
            mr1_ref[:] = mr_cur

            # mc update (after the cell), strict >, from two rows up
            mc_upd = inner & (lane >= 2) & (j_idx >= 2) & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)

            # mf re-init from the column-0 cell (d, 0)
            col0_ok = (d < L) & (xlen > d)  # (BBLK, 1)
            col0_score = jnp.where(x_at_d == y0, P4, M4)
            upd_col = (lane == d) & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_x = jnp.where(upd_col, d, mf_x)
            mf_y = jnp.where(upd_col, Z32, mf_y)
            mfs_ref[:] = mf_s
            mfx_ref[:] = mf_x
            mfy_ref[:] = mf_y

            # advance mc to diagonal d+1: shift down, push column d
            row0_ok = (d < L) & (ylen > d)
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mcs_ref[:] = shift1(mc_s, new_col_s)
            mcx_ref[:] = shift1(mc_x, Z32)

            # best cell on last row/column, reference tie-break
            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = jnp.where(
                elig, s0 * jnp.int32(8192) + lane, jnp.int32(-(2**31) + 1)
            )
            dbest = jnp.max(packed, axis=1, keepdims=True)  # (BBLK, 1)
            # bool reductions are unsupported in Mosaic; "no eligible cell"
            # leaves dbest at the sentinel.
            any_elig = dbest != jnp.int32(-(2**31) + 1)
            ds = jnp.floor_divide(dbest, jnp.int32(8192))
            di = dbest - ds * jnp.int32(8192)
            bs = cbs_ref[:]
            bi = cbi_ref[:]
            bj = cbj_ref[:]
            take = any_elig & ((ds > bs) | ((ds == bs) & (di >= bi)))
            bs = jnp.where(take, ds, bs)
            bi = jnp.where(take, di, bi)
            bj = jnp.where(take, d - di, bj)
            cbs_ref[:] = bs
            cbi_ref[:] = bi
            cbj_ref[:] = bj
            bs_ref[:] = bs
            bi_ref[:] = bi
            bj_ref[:] = bj

            bp_rows.append(jnp.where(
                inner,
                (xfrom * jnp.int32(PACK) + yfrom)
                | (run_cur << jnp.int32(24))
                | (mr_cur << jnp.int32(28)),
                jnp.int32(-1),
            ))
            # rotate score diagonals
            s3_ref[:] = s2
            s2_ref[:] = s1_ref[:]
            s1_ref[:] = s0

        bp_ref[:] = jnp.stack(bp_rows, axis=1)  # (BBLK, UNROLL, L)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_forward_batch_pallas(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
) -> NWResult:
    B, L = X.shape
    assert L == max_len and L % 128 == 0 and B % BBLK == 0
    NDP = 2 * L  # padded diagonal count (multiple of UNROLL)
    grid = (B // BBLK, NDP // UNROLL)  # d innermost: sequential wavefront

    kernel = _make_nw_kernel(L)
    scr = [pltpu.VMEM((BBLK, L), jnp.int32)] * 15 + [
        pltpu.VMEM((BBLK, 1), jnp.int32)
    ] * 3
    out_shape = (
        jax.ShapeDtypeStruct((B, NDP, L), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, d: (0, 0), memory_space=pltpu.SMEM)
    vrow = lambda: pl.BlockSpec(
        (BBLK, L), lambda b, d: (b, 0), memory_space=pltpu.VMEM
    )
    vone = lambda: pl.BlockSpec(
        (BBLK, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM
    )
    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    bp, bs, bi, bj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11, vrow(), vrow(), vrow(), vone(), vone()],
        out_specs=(
            pl.BlockSpec(
                (BBLK, UNROLL, L),
                lambda b, d: (b, d, 0),
                memory_space=pltpu.VMEM,
            ),
            vone(),
            vone(),
            vone(),
        ),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        Xi,
        Xi[:, ::-1],
        Yi[:, ::-1],
        xlen.astype(jnp.int32).reshape(B, 1),
        ylen.astype(jnp.int32).reshape(B, 1),
    )
    return NWResult(
        bp=bp,
        best_score=bs[:, 0],
        best_i=bi[:, 0],
        best_j=bj[:, 0],
    )


def _make_nw_stats_kernel(max_len: int):
    """Stats-only twin of _make_nw_kernel: same recurrence, tie-breaks and
    quirks, but instead of emitting the [B, 2L, L] backpointer tensor it
    carries the packed (length, identities) word of each cell's traceback
    path through the wavefront (the formulation of ops/nw.py
    nw_stats_batch), so per pair the kernel writes 4 scalars to HBM
    instead of ~0.5 MB of moves.  The kernel is VPU-ALU-bound; the
    len+(id<<16) packing keeps the extra carried state to 5 row vectors."""
    L = max_len

    def kernel(igap_ref, egap_ref, x_ref, xr_ref, yr_ref, xlen_ref, ylen_ref,
               bs_ref, bi_ref, bj_ref, bw_ref,
               s1_ref, s2_ref, s3_ref, w1_ref, w2_ref, w3_ref,
               mfs_ref, mfx_ref, mfy_ref, mfw_ref,
               mcs_ref, mcx_ref, mcw_ref,
               yd_ref, xf_ref, yf_ref,
               cbs_ref, cbi_ref, cbj_ref, cbw_ref):
        dbase = pl.program_id(1) * jnp.int32(UNROLL)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        xlen = xlen_ref[:]  # (BBLK, 1)
        ylen = ylen_ref[:]
        xc = x_ref[:]  # (BBLK, L) int32 codes
        lane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, L), 1)
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)

        def shift1(a, fill):
            rolled = pltpu.roll(a, jnp.int32(1), axis=1)
            return jnp.where(lane == 0, fill, rolled)

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((BBLK, L), NEG, jnp.int32)
            zero = jnp.zeros((BBLK, L), jnp.int32)
            for ref in (s1_ref, s2_ref, s3_ref, mfs_ref, mcs_ref):
                ref[:] = neg
            for ref in (w1_ref, w2_ref, w3_ref, mfx_ref, mfy_ref, mfw_ref,
                        mcx_ref, mcw_ref, yd_ref):
                ref[:] = zero
            xf_ref[:] = xr_ref[:]
            yf_ref[:] = yr_ref[:]
            cbs_ref[:] = jnp.full((BBLK, 1), jnp.int32(-(2**31) + 1))
            for ref in (cbi_ref, cbj_ref, cbw_ref):
                ref[:] = jnp.zeros((BBLK, 1), jnp.int32)

        y0 = yr_ref[:, L - 1 : L]
        for u in range(UNROLL):
            d = dbase + jnp.int32(u)
            j_idx = d - lane

            y_new = yf_ref[:, L - 1 : L]
            x_at_d = xf_ref[:, L - 1 : L]
            yf_ref[:] = pltpu.roll(yf_ref[:], jnp.int32(1), axis=1)
            xf_ref[:] = pltpu.roll(xf_ref[:], jnp.int32(1), axis=1)
            yd = shift1(yd_ref[:], y_new)
            yd_ref[:] = yd

            valid = (j_idx >= 0) & (lane < xlen) & (j_idx < ylen)
            inner = valid & (lane >= 1) & (j_idx >= 1)
            is_match = xc == yd
            s_pm = jnp.where(is_match, P4, M4)
            diag_add = jnp.where(
                is_match, jnp.int32((1 << 16) + 1), ONE
            )

            s2 = s2_ref[:]
            s3 = s3_ref[:]
            t_im1_jm1 = shift1(s2, NEG32)
            t_i_jm2 = s2
            t_im1_jm2 = shift1(s3, NEG32)
            t_im2_jm1 = shift1(t_im1_jm2, NEG32)
            w2 = w2_ref[:]
            w3 = w3_ref[:]
            w_im1_jm1 = shift1(w2, Z32)
            w_im1_jm2 = shift1(w3, Z32)
            w_im2_jm1 = shift1(w_im1_jm2, Z32)

            # mf update (before the cell), j > 1
            mf_s = mfs_ref[:]
            mf_x = mfx_ref[:]
            mf_y = mfy_ref[:]
            mf_w = mfw_ref[:]
            mf_upd = valid & (lane >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_x = jnp.where(mf_upd, lane - ONE, mf_x)
            mf_y = jnp.where(mf_upd, j_idx - jnp.int32(2), mf_y)
            mf_w = jnp.where(mf_upd, w_im1_jm2, mf_w)

            # cell scores
            mc_s = mcs_ref[:]
            mc_x = mcx_ref[:]
            mc_w = mcw_ref[:]
            score_diag = t_im1_jm1 + s_pm
            score_left = jnp.where(
                j_idx >= 2,
                mf_s + igap + (j_idx - (mf_y + 1)) * egap + s_pm, NEG32,
            )
            score_right = jnp.where(
                lane >= 2,
                mc_s + igap + (lane - (mc_x + 1)) * egap + s_pm, NEG32,
            )
            pick_diag = (score_diag >= score_left) & (score_diag >= score_right)
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag,
                jnp.where(pick_right, score_right, score_left),
            )

            # packed path stats of this cell
            dxl = lane - mf_x
            dyl = j_idx - mf_y
            add_left = jnp.where(dxl > dyl, dxl, dyl)
            dxr = lane - mc_x
            add_right = jnp.where(dxr > 1, dxr, ONE)
            w_new = jnp.where(
                pick_diag,
                w_im1_jm1 + diag_add,
                jnp.where(pick_right, mc_w + add_right, mf_w + add_left),
            )

            border = valid & ((lane == 0) | (j_idx == 0))
            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)
            w0 = jnp.where(inner, w_new, Z32)

            # mc update (after the cell), strict >, from two rows up
            mc_upd = inner & (lane >= 2) & (j_idx >= 2) & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)
            mc_w = jnp.where(mc_upd, w_im2_jm1, mc_w)

            # mf re-init from the column-0 cell (d, 0): border stats = 0
            col0_ok = (d < L) & (xlen > d)  # (BBLK, 1)
            col0_score = jnp.where(x_at_d == y0, P4, M4)
            upd_col = (lane == d) & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_x = jnp.where(upd_col, d, mf_x)
            mf_y = jnp.where(upd_col, Z32, mf_y)
            mf_w = jnp.where(upd_col, Z32, mf_w)
            mfs_ref[:] = mf_s
            mfx_ref[:] = mf_x
            mfy_ref[:] = mf_y
            mfw_ref[:] = mf_w

            # advance mc to diagonal d+1: shift down, push column d
            row0_ok = (d < L) & (ylen > d)
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mcs_ref[:] = shift1(mc_s, new_col_s)
            mcx_ref[:] = shift1(mc_x, Z32)
            mcw_ref[:] = shift1(mc_w, Z32)

            # best cell on last row/column, reference tie-break
            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = jnp.where(
                elig, s0 * jnp.int32(8192) + lane, jnp.int32(-(2**31) + 1)
            )
            dbest = jnp.max(packed, axis=1, keepdims=True)  # (BBLK, 1)
            any_elig = dbest != jnp.int32(-(2**31) + 1)
            ds = jnp.floor_divide(dbest, jnp.int32(8192))
            di = dbest - ds * jnp.int32(8192)
            at_di = lane == di
            w_at = jnp.sum(jnp.where(at_di, w0, Z32), axis=1, keepdims=True)
            bs = cbs_ref[:]
            bi = cbi_ref[:]
            take = any_elig & ((ds > bs) | ((ds == bs) & (di >= bi)))
            bs = jnp.where(take, ds, bs)
            bi = jnp.where(take, di, bi)
            bj = jnp.where(take, d - di, cbj_ref[:])
            bw = jnp.where(take, w_at, cbw_ref[:])
            cbs_ref[:] = bs
            cbi_ref[:] = bi
            cbj_ref[:] = bj
            cbw_ref[:] = bw
            bs_ref[:] = bs
            bi_ref[:] = bi
            bj_ref[:] = bj
            bw_ref[:] = bw

            # rotate score + stat diagonals
            s3_ref[:] = s2
            s2_ref[:] = s1_ref[:]
            s1_ref[:] = s0
            w3_ref[:] = w2
            w2_ref[:] = w1_ref[:]
            w1_ref[:] = w0

    return kernel


def _make_nw_stats_pipe_kernel(max_len: int):
    """Phase-shifted pipelined twin of _make_nw_stats_kernel.

    The plain wavefront kernel sweeps one pair per sublane row over 2L
    diagonals with only min(d+1, 2L-1-d) of the L lanes valid -- 50% lane
    occupancy.  Here K pairs *stream* through each sublane row with a
    phase offset of exactly L steps: at global step d the "young" pair
    k = d//L occupies lanes [0, e] (e = d mod L, its local diagonal) and
    the "old" pair k-1 occupies lanes [e+1, L-1] (its local diagonal
    e + L), which partitions all L lanes with zero overlap.  K pairs
    finish in (K+1)*L steps instead of 2*L*K -- 2K/(K+1) ~ 1.8x fewer
    steps at ~full occupancy.

    Everything per-pair becomes per-lane-ownership:
      * j index: j = e - lane for the young half, e + L - lane for the
        old half (each pair's local diagonal minus its row).
      * chars: the db char vector xc and the per-lane query chars yd are
        carried state; one lane per step (the entering lane e) takes the
        young pair's next char from flat per-row feed streams
        (feed_x[r, d] = X of pair d//L at base e; feed_y likewise).  The
        shift1 advance of yd crosses the ownership border exactly in
        sync with it, so old-pair lanes keep seeing old-pair chars.
      * lens: per-step young/old length feeds select by lane <= e.
      * best cell: two (BBLK, 1) accumulators by pair parity; each step
        reduces the young and old halves separately with the reference
        tie-break, so each pair sees exactly the per-diagonal reduction
        sequence of the unpipelined kernel.  The accumulator of parity p
        resets when a new pair of that parity enters (e == 0).
      * output: pair k's accumulator is flushed to out[:, k] by the
        block index map -- the last grid step whose "old" pair is k
        contains k's final diagonal, so its (winning) write is complete.

    Ownership-transfer safety: every cross-lane read (shift1) of a cell
    at (i-1, ...) or (i-2, ...) is guarded by the same lane/j bounds as
    the unpipelined kernel, and a lane's first two steps under a new
    owner only compute border/j<=1 cells whose gap reads are masked --
    so no value ever crosses between pairs (bit-equality proven against
    nw_stats_batch in tests/test_nw_stats.py).

    Mosaic lowering notes (this shape survived the real-TPU toolchain;
    the first draft did not): per-step feeds are (n_grid, R, UNROLL)
    VMEM blocks of (1, BBLK, UNROLL) -- the last block dim equals the
    overall array dim, the only legal sub-(8,128) tiling -- and the
    per-step scalars e/py/op are derived in-kernel from program_id
    (exact because UNROLL divides L, so a grid step never straddles a
    phase boundary), not streamed through sub-tile SMEM windows."""
    L = max_len
    PHASE = L // UNROLL  # grid steps per pipeline phase

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               fxl_o_ref, fyl_o_ref,
               bs_ref, bi_ref, bj_ref, bw_ref,
               s1_ref, s2_ref, s3_ref, w1_ref, w2_ref, w3_ref,
               mfs_ref, mfx_ref, mfy_ref, mfw_ref,
               mcs_ref, mcx_ref, mcw_ref,
               yd_ref, xc_ref,
               a0s_ref, a0i_ref, a0j_ref, a0w_ref,
               a1s_ref, a1i_ref, a1j_ref, a1w_ref):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL)
        q = g // jnp.int32(PHASE)  # phase index = d // L, same for all u
        ebase = (g - q * jnp.int32(PHASE)) * jnp.int32(UNROLL)
        qpar = q & jnp.int32(1)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, L), 1)
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)
        SENT = jnp.int32(-(2**31) + 1)

        def shift1(a, fill):
            rolled = pltpu.roll(a, jnp.int32(1), axis=1)
            return jnp.where(lane == 0, fill, rolled)

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((BBLK, L), NEG, jnp.int32)
            zero = jnp.zeros((BBLK, L), jnp.int32)
            for ref in (s1_ref, s2_ref, s3_ref, mfs_ref, mcs_ref):
                ref[:] = neg
            for ref in (w1_ref, w2_ref, w3_ref, mfx_ref, mfy_ref, mfw_ref,
                        mcx_ref, mcw_ref, yd_ref, xc_ref):
                ref[:] = zero
            for ref in (a0s_ref, a1s_ref):
                ref[:] = jnp.full((BBLK, 1), SENT)
            for ref in (a0i_ref, a0j_ref, a0w_ref, a1i_ref, a1j_ref,
                        a1w_ref):
                ref[:] = jnp.zeros((BBLK, 1), jnp.int32)

        for u in range(UNROLL):
            e = ebase + jnp.int32(u)  # entering lane = young local diagonal
            py = qpar  # young pair's parity (constant within a grid step)
            x_new = fx_ref[0, :, u : u + 1]  # (BBLK, 1) young X[e]
            y_new = fy_ref[0, :, u : u + 1]  # young Y[e]
            y0 = fy0_ref[0, :, u : u + 1]  # young Y[0]
            young = lane <= e
            j_idx = jnp.where(young, e - lane, e + jnp.int32(L) - lane)
            xlen = jnp.where(young, fxl_y_ref[0, :, u : u + 1],
                             fxl_o_ref[0, :, u : u + 1])
            ylen = jnp.where(young, fyl_y_ref[0, :, u : u + 1],
                             fyl_o_ref[0, :, u : u + 1])

            # entering lane takes the young pair's next db char; yd
            # advances one lane with the young pair's next query char.
            xc = jnp.where(lane == e, x_new, xc_ref[:])
            xc_ref[:] = xc
            yd = shift1(yd_ref[:], y_new)
            yd_ref[:] = yd

            valid = (lane < xlen) & (j_idx < ylen)
            inner = valid & (lane >= 1) & (j_idx >= 1)
            is_match = xc == yd
            s_pm = jnp.where(is_match, P4, M4)
            diag_add = jnp.where(is_match, jnp.int32((1 << 16) + 1), ONE)

            s2 = s2_ref[:]
            s3 = s3_ref[:]
            t_im1_jm1 = shift1(s2, NEG32)
            t_i_jm2 = s2
            t_im1_jm2 = shift1(s3, NEG32)
            t_im2_jm1 = shift1(t_im1_jm2, NEG32)
            w2 = w2_ref[:]
            w3 = w3_ref[:]
            w_im1_jm1 = shift1(w2, Z32)
            w_im1_jm2 = shift1(w3, Z32)
            w_im2_jm1 = shift1(w_im1_jm2, Z32)

            # mf update (before the cell), j > 1
            mf_s = mfs_ref[:]
            mf_x = mfx_ref[:]
            mf_y = mfy_ref[:]
            mf_w = mfw_ref[:]
            mf_upd = valid & (lane >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_x = jnp.where(mf_upd, lane - ONE, mf_x)
            mf_y = jnp.where(mf_upd, j_idx - jnp.int32(2), mf_y)
            mf_w = jnp.where(mf_upd, w_im1_jm2, mf_w)

            # cell scores
            mc_s = mcs_ref[:]
            mc_x = mcx_ref[:]
            mc_w = mcw_ref[:]
            score_diag = t_im1_jm1 + s_pm
            score_left = jnp.where(
                j_idx >= 2,
                mf_s + igap + (j_idx - (mf_y + 1)) * egap + s_pm, NEG32,
            )
            score_right = jnp.where(
                lane >= 2,
                mc_s + igap + (lane - (mc_x + 1)) * egap + s_pm, NEG32,
            )
            pick_diag = (score_diag >= score_left) & (
                score_diag >= score_right
            )
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag,
                jnp.where(pick_right, score_right, score_left),
            )

            # packed path stats of this cell
            dxl = lane - mf_x
            dyl = j_idx - mf_y
            add_left = jnp.where(dxl > dyl, dxl, dyl)
            dxr = lane - mc_x
            add_right = jnp.where(dxr > 1, dxr, ONE)
            w_new = jnp.where(
                pick_diag,
                w_im1_jm1 + diag_add,
                jnp.where(pick_right, mc_w + add_right, mf_w + add_left),
            )

            border = valid & ((lane == 0) | (j_idx == 0))
            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)
            w0 = jnp.where(inner, w_new, Z32)

            # mc update (after the cell), strict >, from two rows up
            mc_upd = inner & (lane >= 2) & (j_idx >= 2) & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)
            mc_w = jnp.where(mc_upd, w_im2_jm1, mc_w)

            # mf re-init from the young pair's column-0 cell (e, 0)
            col0_ok = fxl_y_ref[0, :, u : u + 1] > e  # (BBLK, 1)
            col0_score = jnp.where(x_new == y0, P4, M4)
            upd_col = (lane == e) & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_x = jnp.where(upd_col, e, mf_x)
            mf_y = jnp.where(upd_col, Z32, mf_y)
            mf_w = jnp.where(upd_col, Z32, mf_w)
            mfs_ref[:] = mf_s
            mfx_ref[:] = mf_x
            mfy_ref[:] = mf_y
            mfw_ref[:] = mf_w

            # advance mc: shift down, push the young pair's column e
            row0_ok = fyl_y_ref[0, :, u : u + 1] > e
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mcs_ref[:] = shift1(mc_s, new_col_s)
            mcx_ref[:] = shift1(mc_x, Z32)
            mcw_ref[:] = shift1(mc_w, Z32)

            # best cell on last row/column: one masked reduction per
            # ownership half, each feeding its parity's accumulator with
            # the reference cross-diagonal take rule.
            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = s0 * jnp.int32(8192) + lane
            d_y = e  # young local diagonal
            d_o = e + jnp.int32(L)  # old local diagonal

            for half, d_loc, par in ((young, d_y, py),
                                     (~young, d_o, ONE - py)):
                hmax = jnp.max(
                    jnp.where(elig & half, packed, SENT),
                    axis=1, keepdims=True,
                )
                any_elig = hmax != SENT
                ds = jnp.floor_divide(hmax, jnp.int32(8192))
                di = hmax - ds * jnp.int32(8192)
                at_di = (lane == di) & half
                w_at = jnp.sum(
                    jnp.where(at_di, w0, Z32), axis=1, keepdims=True
                )
                # accumulator of this half's parity (reset on entry)
                use0 = par == 0
                fresh = (e == 0) & (par == py)
                acc_s = jnp.where(use0, a0s_ref[:], a1s_ref[:])
                acc_s = jnp.where(fresh, SENT, acc_s)
                acc_i = jnp.where(use0, a0i_ref[:], a1i_ref[:])
                acc_i = jnp.where(fresh, Z32, acc_i)
                acc_j = jnp.where(use0, a0j_ref[:], a1j_ref[:])
                acc_j = jnp.where(fresh, Z32, acc_j)
                acc_w = jnp.where(use0, a0w_ref[:], a1w_ref[:])
                acc_w = jnp.where(fresh, Z32, acc_w)
                take = any_elig & (
                    (ds > acc_s) | ((ds == acc_s) & (di >= acc_i))
                )
                acc_s = jnp.where(take, ds, acc_s)
                acc_i = jnp.where(take, di, acc_i)
                acc_j = jnp.where(take, d_loc - di, acc_j)
                acc_w = jnp.where(take, w_at, acc_w)
                a0s_ref[:] = jnp.where(use0, acc_s, a0s_ref[:])
                a0i_ref[:] = jnp.where(use0, acc_i, a0i_ref[:])
                a0j_ref[:] = jnp.where(use0, acc_j, a0j_ref[:])
                a0w_ref[:] = jnp.where(use0, acc_w, a0w_ref[:])
                a1s_ref[:] = jnp.where(use0, a1s_ref[:], acc_s)
                a1i_ref[:] = jnp.where(use0, a1i_ref[:], acc_i)
                a1j_ref[:] = jnp.where(use0, a1j_ref[:], acc_j)
                a1w_ref[:] = jnp.where(use0, a1w_ref[:], acc_w)

            # rotate score + stat diagonals
            s3_ref[:] = s2
            s2_ref[:] = s1_ref[:]
            s1_ref[:] = s0
            w3_ref[:] = w2
            w2_ref[:] = w1_ref[:]
            w1_ref[:] = w0

        # flush the completing pair's accumulator into its slot of the
        # revisited (BBLK, K) output block (same block every grid step:
        # masked read-modify-write; the last grid step whose "old" pair
        # is k holds k's final diagonals, so its write wins).
        op_slot = jnp.maximum(q - jnp.int32(1), jnp.int32(0))
        use0 = (op_slot & jnp.int32(1)) == 0
        kiota = jax.lax.broadcasted_iota(jnp.int32, (BBLK, PIPE_K), 1)
        mask = kiota == op_slot
        for out_ref, a0, a1 in ((bs_ref, a0s_ref, a1s_ref),
                                (bi_ref, a0i_ref, a1i_ref),
                                (bj_ref, a0j_ref, a1j_ref),
                                (bw_ref, a0w_ref, a1w_ref)):
            val = jnp.where(use0, a0[:], a1[:])  # (BBLK, 1)
            out_ref[:] = jnp.where(mask, val, out_ref[:])

    return kernel


# Pairs streamed per sublane row in the pipelined stats kernel.
PIPE_K = 8


def _make_nw_stats_pipe3_kernel(max_len: int):
    """v3 pipelined stats kernel: same stream layout, recurrence, quirks
    and bit-equal outputs as _make_nw_stats_pipe2_kernel, restructured
    around the measured bottleneck (VERDICT r4): the kernel is VPU
    issue-bound, so wall time tracks the vector-op count per diagonal.

    Changes vs v2:
      1. Carried wavefront state (3 score + 3 stat diagonals, mf/mc
         trackers, char feeds, best-cell accumulator/staging, lens) is
         loaded from VMEM ONCE per grid step, threaded through the
         unrolled steps as SSA values, and stored back once at the end;
         the mod-4 rotating buffers become free register renames.
      2. Unguarded lane shifts: the lane-0 fill select after pltpu.roll
         is dropped for the six TRANSIENT read shifts (t_*, w_*) whose
         lane-0/1 consumers are already masked by border/valid/lane
         guards.  Persistent carried state (yd, the mc_s/mc_x/mc_w
         advance) keeps its fills -- a wrapped lane-0 value there would
         roll to lane 2 where score_right legitimately reads it.
      3. Single per-lane best accumulator with harvest-at-handover: when
         lane e transfers to the young pair, the old owner's completed
         per-lane maximum moves to a staging row and the accumulator
         resets to the sentinel; the phase-end flush reduces the staging
         row (which then holds exactly the finished pair's lanes).
         Replaces v2's two parity accumulators and their four selects.
      4. xlen/ylen become carried registers updated at handover, deleting
         the two old-pair length feed streams.
      5. Static lane masks, lane*4096 and lane*egap hoisted; the
         pipelined-stream identities j==0 <=> lane==e and
         j>=1 <=> lane!=e fold the border/inner masks; mf/mc update
         guards share one inner&(j>=2) term.

    Ownership-transfer safety: as in v2 (see _make_nw_stats_pipe_kernel),
    plus the new unguarded shifts argued in (2)."""
    L = max_len
    PHASE = L // UNROLL2
    K = PIPE2_K

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               bs_ref, bi_ref, bj_ref, bw_ref,
               sb1, sb2, sbR1, sbR2, sbR3, wb1, wb2, wb3,
               mfs_ref, mfxy_ref, mfw_ref, mcs_ref, mcx_ref, mcw_ref,
               yd_ref, xc_ref, xl_ref, yl_ref,
               acc_ref, accw_ref, sta_ref, stw_ref):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL2)
        q = g // jnp.int32(PHASE)  # phase index = d // L
        ebase = (g - q * jnp.int32(PHASE)) * jnp.int32(UNROLL2)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, L), 1)
        lane4096 = lane * jnp.int32(4096)
        lane_egap = lane * egap
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)
        SENT = jnp.int32(-(2**31) + 1)
        lane_is0 = lane == 0
        lane_ge2 = lane >= 2

        def roll1(a):
            return pltpu.roll(a, jnp.int32(1), axis=1)

        def shift1(a, fill):
            return jnp.where(lane_is0, fill, roll1(a))

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((RBLK2, L), NEG, jnp.int32)
            zero = jnp.zeros((RBLK2, L), jnp.int32)
            sent = jnp.full((RBLK2, L), SENT, jnp.int32)
            for ref in (sb1, sb2, sbR1, sbR2, sbR3, mfs_ref, mcs_ref):
                ref[:] = neg
            for ref in (wb1, wb2, wb3, mfxy_ref, mfw_ref,
                        mcx_ref, mcw_ref, yd_ref, xc_ref, xl_ref,
                        yl_ref, accw_ref, stw_ref):
                ref[:] = zero
            acc_ref[:] = sent
            sta_ref[:] = sent

        # one VMEM load per carried row per GRID step (not per diagonal).
        # The score diagonals are carried BOTH raw and pre-rolled (sbR*),
        # and the stat diagonals pre-rolled only (their raw form is never
        # read): the roll moves to the rotation (one per diagonal instead
        # of one per consumer), cutting the per-step lane-roll count from
        # 10 to 8 -- rolls are ~15% of kernel time (measured by the
        # norolls probe, BASELINE.md roofline note).
        s_dm1 = sb1[:]
        s_dm2 = sb2[:]
        sR_dm1 = sbR1[:]
        sR_dm2 = sbR2[:]
        sR_dm3 = sbR3[:]
        wR_dm1 = wb1[:]
        wR_dm2 = wb2[:]
        wR_dm3 = wb3[:]
        mf_s = mfs_ref[:]
        mf_xy = mfxy_ref[:]
        mf_w = mfw_ref[:]
        mc_s = mcs_ref[:]
        mc_x = mcx_ref[:]
        mc_w = mcw_ref[:]
        yd = yd_ref[:]
        xc = xc_ref[:]
        xlen = xl_ref[:]
        ylen = yl_ref[:]
        acc = acc_ref[:]
        accw = accw_ref[:]
        sta = sta_ref[:]
        stw = stw_ref[:]

        for u in range(UNROLL2):
            e = ebase + jnp.int32(u)
            s2 = s_dm2  # diagonal d-2 (raw)
            x_new = fx_ref[0, :, u : u + 1]  # (RBLK2, 1) young X[e]
            y_new = fy_ref[0, :, u : u + 1]
            y0 = fy0_ref[0, :, u : u + 1]
            xl_y = fxl_y_ref[0, :, u : u + 1]
            yl_y = fyl_y_ref[0, :, u : u + 1]
            young = lane <= e
            j_idx = (e - lane) + jnp.where(young, Z32, jnp.int32(L))
            eq_e = lane == e

            # handover: lane e's owner becomes the young pair -- harvest
            # the old owner's completed per-lane best into staging first
            sta = jnp.where(eq_e, acc, sta)
            stw = jnp.where(eq_e, accw, stw)
            acc = jnp.where(eq_e, SENT, acc)
            xc = jnp.where(eq_e, x_new, xc)
            xlen = jnp.where(eq_e, xl_y, xlen)
            ylen = jnp.where(eq_e, yl_y, ylen)
            yd = shift1(yd, y_new)

            valid = (lane < xlen) & (j_idx < ylen)
            # j==0 <=> lane==e; j>=1 <=> lane!=e (old pairs have j>=e+1)
            bmask = lane_is0 | eq_e
            border = valid & bmask
            inner = valid ^ border  # valid & lane>=1 & j>=1
            is_match = xc == yd
            s_pm = jnp.where(is_match, P4, M4)
            diag_add = jnp.where(is_match, jnp.int32((1 << 16) + 1), ONE)

            # unguarded shifts: wrapped lane-0 values only feed masked
            # consumers (see docstring change 2); most rolled operands
            # come pre-rolled from the rotation
            t_im1_jm1 = sR_dm2
            t_i_jm2 = s2
            t_im1_jm2 = sR_dm3
            t_im2_jm1 = roll1(sR_dm3)
            w_im1_jm1 = wR_dm2
            w_im1_jm2 = wR_dm3
            w_im2_jm1 = roll1(wR_dm3)

            # mf update (before the cell), j > 1
            lanej = lane4096 + j_idx
            jge2 = j_idx >= 2
            ij2 = inner & jge2
            mf_upd = ij2 & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_xy = jnp.where(mf_upd, lanej - jnp.int32(4098), mf_xy)
            mf_w = jnp.where(mf_upd, w_im1_jm2, mf_w)

            # cell scores (gap distances unpacked from mf_xy)
            score_diag = t_im1_jm1 + s_pm
            dxy = lanej - mf_xy
            dyl = dxy & jnp.int32(4095)
            dxl = dxy >> jnp.int32(12)
            score_left = jnp.where(
                jge2,
                mf_s + (igap - egap) + dyl * egap + s_pm, NEG32,
            )
            score_right = jnp.where(
                lane_ge2,
                (mc_s + (igap - egap) - mc_x * egap) + lane_egap + s_pm,
                NEG32,
            )
            pick_diag = (score_diag >= score_left) & (
                score_diag >= score_right
            )
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag,
                jnp.where(pick_right, score_right, score_left),
            )

            # packed path stats of this cell
            add_left = jnp.where(dxl > dyl, dxl, dyl)
            dxr = lane - mc_x
            add_right = jnp.where(dxr > 1, dxr, ONE)
            w_new = jnp.where(
                pick_diag,
                w_im1_jm1 + diag_add,
                jnp.where(pick_right, mc_w + add_right, mf_w + add_left),
            )

            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)
            w0 = jnp.where(inner, w_new, Z32)

            # mc update (after the cell), strict >, from two rows up
            mc_upd = ij2 & lane_ge2 & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)
            mc_w = jnp.where(mc_upd, w_im2_jm1, mc_w)

            # mf re-init from the young pair's column-0 cell (e, 0)
            col0_ok = xl_y > e  # (RBLK2, 1)
            col0_score = jnp.where(x_new == y0, P4, M4)
            upd_col = eq_e & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_xy = jnp.where(upd_col, lane4096, mf_xy)  # (x=e=lane, y=0)
            mf_w = jnp.where(upd_col, Z32, mf_w)

            # advance mc: shift down, push the young pair's column e.
            # mc_* are PERSISTENT state: their pushes keep the fills (a
            # wrapped lane-0 value would roll to lane 2 where score_right
            # legitimately reads it two steps later).
            row0_ok = yl_y > e
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mc_s = shift1(mc_s, new_col_s)
            mc_x = shift1(mc_x, Z32)
            mc_w = shift1(mc_w, Z32)

            # single per-lane best accumulator (harvested at handover)
            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = (s0 << jnp.int32(13)) | (lane + j_idx)  # d_loc = i+j
            npm = jnp.where(elig, packed, SENT)
            upd = npm > acc
            acc = jnp.where(upd, npm, acc)
            accw = jnp.where(upd, w0, accw)

            # rotate diagonals: register renames plus ONE roll per stream
            # (the pre-rolled forms of the new diagonal)
            s_dm2 = s_dm1
            s_dm1 = s0
            sR_dm3 = sR_dm2
            sR_dm2 = sR_dm1
            sR_dm1 = roll1(s0)
            wR_dm3 = wR_dm2
            wR_dm2 = wR_dm1
            wR_dm1 = roll1(w0)

        # one VMEM store per carried row per grid step
        sb1[:] = s_dm1
        sb2[:] = s_dm2
        sbR1[:] = sR_dm1
        sbR2[:] = sR_dm2
        sbR3[:] = sR_dm3
        wb1[:] = wR_dm1
        wb2[:] = wR_dm2
        wb3[:] = wR_dm3
        mfs_ref[:] = mf_s
        mfxy_ref[:] = mf_xy
        mfw_ref[:] = mf_w
        mcs_ref[:] = mc_s
        mcx_ref[:] = mc_x
        mcw_ref[:] = mc_w
        yd_ref[:] = yd
        xc_ref[:] = xc
        xl_ref[:] = xlen
        yl_ref[:] = ylen
        acc_ref[:] = acc
        accw_ref[:] = accw
        sta_ref[:] = sta
        stw_ref[:] = stw

        # phase-end epilogue: after the last handover of phase q the
        # staging row holds exactly pair q-1's completed per-lane maxima
        # (lane e was harvested at step e; pair q-1's last cell on lane e
        # was computed one step earlier).  Reduce it into output slot q-1
        # with the associative (score, i, d) fold of v2.
        @pl.when((ebase == jnp.int32(L - UNROLL2)) & (q >= 1))
        def _flush():
            Ap = sta_ref[:]
            Wp = stw_ref[:]
            amax = jnp.max(Ap, axis=1, keepdims=True)  # (RBLK2, 1)
            any_ = amax != SENT
            s_l = Ap >> jnp.int32(13)
            smax = amax >> jnp.int32(13)
            bi = jnp.max(
                jnp.where(s_l == smax, lane, jnp.int32(-1)),
                axis=1, keepdims=True,
            )
            at = lane == bi
            dsel = jnp.sum(
                jnp.where(at, Ap & jnp.int32(8191), Z32),
                axis=1, keepdims=True,
            )
            wsel = jnp.sum(jnp.where(at, Wp, Z32), axis=1, keepdims=True)
            bs_v = jnp.where(any_, smax, SENT)
            bi_v = jnp.where(any_, bi, Z32)
            bj_v = jnp.where(any_, dsel - bi, Z32)
            bw_v = jnp.where(any_, wsel, Z32)
            slot = q - jnp.int32(1)
            kiota = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, K), 1)
            mask = kiota == slot
            bs_ref[:] = jnp.where(mask, bs_v, bs_ref[:])
            bi_ref[:] = jnp.where(mask, bi_v, bi_ref[:])
            bj_ref[:] = jnp.where(mask, bj_v, bj_ref[:])
            bw_ref[:] = jnp.where(mask, bw_v, bw_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_stats_batch_pallas_pipe3(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
) -> NWStatsResult:
    """v3 registerized pipelined stats aligner (see
    _make_nw_stats_pipe3_kernel).  Bit-equal to nw_stats_batch and the
    v1/v2 Pallas kernels; v2's feed layout minus the old-pair length
    streams (lens are carried in-kernel), 22 scratch rows."""
    B, L = X.shape
    K = PIPE2_K
    assert L == max_len and L % 128 == 0
    assert B % (RBLK2 * K) == 0, (B, RBLK2, K)
    assert L % UNROLL2 == 0
    R = B // K
    NS = (K + 1) * L
    n_grid = NS // UNROLL2
    grid = (R // RBLK2, n_grid)

    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    xl = xlen.astype(jnp.int32)
    yl = ylen.astype(jnp.int32)

    padL = jnp.zeros((R, L), jnp.int32)
    g3 = lambda a: a.reshape(R, n_grid, UNROLL2).transpose(1, 0, 2)
    fx = g3(jnp.concatenate([Xi.reshape(R, K * L), padL], axis=1))
    fy = g3(jnp.concatenate([Yi.reshape(R, K * L), padL], axis=1))
    rep = lambda v: jnp.repeat(v.reshape(R, K), L, axis=1)
    fy0 = g3(jnp.concatenate([rep(Yi[:, 0]), padL], axis=1))
    fxl_y = g3(jnp.concatenate([rep(xl), padL], axis=1))
    fyl_y = g3(jnp.concatenate([rep(yl), padL], axis=1))

    kernel = _make_nw_stats_pipe3_kernel(L)
    scr = [pltpu.VMEM((RBLK2, L), jnp.int32)] * 22
    out_shape = tuple(
        jax.ShapeDtypeStruct((R, K), jnp.int32) for _ in range(4)
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, g: (0, 0), memory_space=pltpu.SMEM)
    feedU = lambda: pl.BlockSpec(
        (1, RBLK2, UNROLL2), lambda b, g: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RBLK2, K), lambda b, g: (b, 0), memory_space=pltpu.VMEM
    )
    bs, bi, bj, bw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11,
                  feedU(), feedU(), feedU(), feedU(), feedU()],
        out_specs=tuple(out_spec for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        fx, fy, fy0, fxl_y, fyl_y,
    )
    return NWStatsResult(
        best_score=bs.reshape(B),
        best_i=bi.reshape(B),
        best_j=bj.reshape(B),
        length=bw.reshape(B) & 0xFFFF,
        identities=bw.reshape(B) >> 16,
    )

# v2 pipelined stats kernel: wider sublane block and longer pair stream
# (ramp/drain overhead K/(K+1) -> 16/17), plus the cheaper best-cell
# machinery below.
RBLK2 = 16
PIPE2_K = 16
UNROLL2 = 8  # diagonals per grid step for the v2 kernel (own knob)


def _make_nw_stats_pipe2_kernel(max_len: int):
    """v2 of the pipelined stats kernel (same DP recurrence and quirks as
    _make_nw_stats_pipe_kernel, bit-equal outputs) with three structural
    cost cuts, aimed at the VPU-ALU bound:

    1. Associative best-cell fold.  The reference's sequential
       cross-diagonal take rule (ds > bs) | (ds == bs & di >= bi)
       (src/alignmentFunctions.c:481-484 order) is equivalent to the
       lexicographic maximum of (score, i, d) over all eligible cells:
       equal-score candidates arrive per diagonal with their max i, and
       the fold's running bi only ever moves to the globally largest i
       (the max element always satisfies i >= bi when it arrives), after
       which only later diagonals at that same i can take.  So instead of
       a masked reduction per step per half (4 reductions + ~40 scalar
       ops), each *lane* (= row i) keeps a packed running max
       A = max(score << 13 | d_local) -- one vector max per parity --
       and once per PHASE a short epilogue reduces across lanes:
       smax -> max lane achieving it -> that lane's packed d.  Lanes are
       routed to one of two accumulators by pair *parity* (young/old
       pairs alternate parity), so a pair's accumulator is complete and
       exclusive exactly when it finishes its old phase.
    2. Four rotating score/stat diagonal buffers addressed statically by
       step index mod 4 (UNROLL2 % 4 == 0 keeps the mapping grid-step
       invariant), eliminating the two full-array copies per step each
       that the 3-buffer rotation needed.
    3. mf_x/mf_y packed into one word (x*4096 + y, both < 4096 =
       MAX_READ_SIZE bound): one carried array and one update select
       fewer; the gap distances unpack with a shift/mask pair.

    Stream layout, handover rules, and ownership-transfer safety are
    identical to _make_nw_stats_pipe_kernel (see its docstring)."""
    L = max_len
    PHASE = L // UNROLL2
    K = PIPE2_K
    assert UNROLL2 % 4 == 0

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               fxl_o_ref, fyl_o_ref,
               bs_ref, bi_ref, bj_ref, bw_ref,
               sb0, sb1, sb2, sb3, wb0, wb1, wb2, wb3,
               mfs_ref, mfxy_ref, mfw_ref, mcs_ref, mcx_ref, mcw_ref,
               yd_ref, xc_ref, a0_ref, a1_ref, v0_ref, v1_ref):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL2)
        q = g // jnp.int32(PHASE)  # phase index = d // L
        ebase = (g - q * jnp.int32(PHASE)) * jnp.int32(UNROLL2)
        qpar = q & jnp.int32(1)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, L), 1)
        lane4096 = lane * jnp.int32(4096)
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)
        SENT = jnp.int32(-(2**31) + 1)
        sbufs = (sb0, sb1, sb2, sb3)
        wbufs = (wb0, wb1, wb2, wb3)

        def shift1(a, fill):
            rolled = pltpu.roll(a, jnp.int32(1), axis=1)
            return jnp.where(lane == 0, fill, rolled)

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((RBLK2, L), NEG, jnp.int32)
            zero = jnp.zeros((RBLK2, L), jnp.int32)
            sent = jnp.full((RBLK2, L), SENT, jnp.int32)
            for ref in (sb0, sb1, sb2, sb3, mfs_ref, mcs_ref):
                ref[:] = neg
            for ref in (wb0, wb1, wb2, wb3, mfxy_ref, mfw_ref,
                        mcx_ref, mcw_ref, yd_ref, xc_ref, v0_ref, v1_ref):
                ref[:] = zero
            a0_ref[:] = sent
            a1_ref[:] = sent

        for u in range(UNROLL2):
            e = ebase + jnp.int32(u)
            s2 = sbufs[(u + 2) % 4][:]  # diagonal d-2
            s3 = sbufs[(u + 1) % 4][:]  # diagonal d-3
            w2 = wbufs[(u + 2) % 4][:]
            w3 = wbufs[(u + 1) % 4][:]
            x_new = fx_ref[0, :, u : u + 1]  # (RBLK2, 1) young X[e]
            y_new = fy_ref[0, :, u : u + 1]
            y0 = fy0_ref[0, :, u : u + 1]
            young = lane <= e
            j_idx = (e - lane) + jnp.where(young, Z32, jnp.int32(L))
            xlen = jnp.where(young, fxl_y_ref[0, :, u : u + 1],
                             fxl_o_ref[0, :, u : u + 1])
            ylen = jnp.where(young, fyl_y_ref[0, :, u : u + 1],
                             fyl_o_ref[0, :, u : u + 1])
            eq_e = lane == e

            xc = jnp.where(eq_e, x_new, xc_ref[:])
            xc_ref[:] = xc
            yd = shift1(yd_ref[:], y_new)
            yd_ref[:] = yd

            valid = (lane < xlen) & (j_idx < ylen)
            inner = valid & (lane >= 1) & (j_idx >= 1)
            is_match = xc == yd
            s_pm = jnp.where(is_match, P4, M4)
            diag_add = jnp.where(is_match, jnp.int32((1 << 16) + 1), ONE)

            t_im1_jm1 = shift1(s2, NEG32)
            t_i_jm2 = s2
            sh_s3 = shift1(s3, NEG32)
            t_im1_jm2 = sh_s3
            t_im2_jm1 = shift1(sh_s3, NEG32)
            w_im1_jm1 = shift1(w2, Z32)
            w_im1_jm2 = shift1(w3, Z32)
            w_im2_jm1 = shift1(w_im1_jm2, Z32)

            # mf update (before the cell), j > 1
            mf_s = mfs_ref[:]
            mf_xy = mfxy_ref[:]
            mf_w = mfw_ref[:]
            lanej = lane4096 + j_idx
            mf_upd = valid & (lane >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_xy = jnp.where(mf_upd, lanej - jnp.int32(4098), mf_xy)
            mf_w = jnp.where(mf_upd, w_im1_jm2, mf_w)

            # cell scores (gap distances unpacked from mf_xy)
            mc_s = mcs_ref[:]
            mc_x = mcx_ref[:]
            mc_w = mcw_ref[:]
            score_diag = t_im1_jm1 + s_pm
            dxy = lanej - mf_xy
            dyl = dxy & jnp.int32(4095)
            dxl = dxy >> jnp.int32(12)
            score_left = jnp.where(
                j_idx >= 2,
                mf_s + (igap - egap) + dyl * egap + s_pm, NEG32,
            )
            score_right = jnp.where(
                lane >= 2,
                mc_s + igap + (lane - (mc_x + 1)) * egap + s_pm, NEG32,
            )
            pick_diag = (score_diag >= score_left) & (
                score_diag >= score_right
            )
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag,
                jnp.where(pick_right, score_right, score_left),
            )

            # packed path stats of this cell
            add_left = jnp.where(dxl > dyl, dxl, dyl)
            dxr = lane - mc_x
            add_right = jnp.where(dxr > 1, dxr, ONE)
            w_new = jnp.where(
                pick_diag,
                w_im1_jm1 + diag_add,
                jnp.where(pick_right, mc_w + add_right, mf_w + add_left),
            )

            border = valid & ((lane == 0) | (j_idx == 0))
            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)
            w0 = jnp.where(inner, w_new, Z32)

            # mc update (after the cell), strict >, from two rows up
            mc_upd = inner & (lane >= 2) & (j_idx >= 2) & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)
            mc_w = jnp.where(mc_upd, w_im2_jm1, mc_w)

            # mf re-init from the young pair's column-0 cell (e, 0)
            col0_ok = fxl_y_ref[0, :, u : u + 1] > e  # (RBLK2, 1)
            col0_score = jnp.where(x_new == y0, P4, M4)
            upd_col = eq_e & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_xy = jnp.where(upd_col, lane4096, mf_xy)  # (x=e=lane, y=0)
            mf_w = jnp.where(upd_col, Z32, mf_w)
            mfs_ref[:] = mf_s
            mfxy_ref[:] = mf_xy
            mfw_ref[:] = mf_w

            # advance mc: shift down, push the young pair's column e
            row0_ok = fyl_y_ref[0, :, u : u + 1] > e
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mcs_ref[:] = shift1(mc_s, new_col_s)
            mcx_ref[:] = shift1(mc_x, Z32)
            mcw_ref[:] = shift1(mc_w, Z32)

            # per-lane best-cell accumulators by pair parity.  No per-lane
            # reset is needed at ownership handover: the parity-p
            # accumulator is flushed AND reset whole by the epilogue at
            # the end of the phase in which the previous parity-p pair
            # finished -- exactly one phase before the next parity-p pair
            # starts writing.
            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = (s0 << jnp.int32(13)) | (lane + j_idx)  # d_loc = i + j
            npm = jnp.where(elig, packed, SENT)
            # lanes whose owning pair has parity 0 (select between bool
            # vectors is illegal in Mosaic; xor with the scalar instead)
            m0 = young ^ (qpar != 0)
            c0 = jnp.where(m0, npm, SENT)
            a0 = a0_ref[:]
            upd0 = c0 > a0
            a0_ref[:] = jnp.where(upd0, c0, a0)
            v0_ref[:] = jnp.where(upd0, w0, v0_ref[:])
            c1 = jnp.where(m0, SENT, npm)
            a1 = a1_ref[:]
            upd1 = c1 > a1
            a1_ref[:] = jnp.where(upd1, c1, a1)
            v1_ref[:] = jnp.where(upd1, w0, v1_ref[:])

            sbufs[u % 4][:] = s0
            wbufs[u % 4][:] = w0

        # phase-end epilogue: the pair that just finished its old phase
        # (parity (q-1) & 1) has a complete, exclusive accumulator; fold
        # it across lanes (lex-max (s, i, d)) into output slot q-1.
        @pl.when((ebase == jnp.int32(L - UNROLL2)) & (q >= 1))
        def _flush():
            oldpar = (q - jnp.int32(1)) & jnp.int32(1)
            use0 = oldpar == 0
            Ap = jnp.where(use0, a0_ref[:], a1_ref[:])
            Wp = jnp.where(use0, v0_ref[:], v1_ref[:])
            amax = jnp.max(Ap, axis=1, keepdims=True)  # (RBLK2, 1)
            any_ = amax != SENT
            s_l = Ap >> jnp.int32(13)
            smax = amax >> jnp.int32(13)
            bi = jnp.max(
                jnp.where(s_l == smax, lane, jnp.int32(-1)),
                axis=1, keepdims=True,
            )
            at = lane == bi
            dsel = jnp.sum(
                jnp.where(at, Ap & jnp.int32(8191), Z32),
                axis=1, keepdims=True,
            )
            wsel = jnp.sum(jnp.where(at, Wp, Z32), axis=1, keepdims=True)
            bs_v = jnp.where(any_, smax, SENT)
            bi_v = jnp.where(any_, bi, Z32)
            bj_v = jnp.where(any_, dsel - bi, Z32)
            bw_v = jnp.where(any_, wsel, Z32)
            slot = q - jnp.int32(1)
            kiota = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, K), 1)
            mask = kiota == slot
            bs_ref[:] = jnp.where(mask, bs_v, bs_ref[:])
            bi_ref[:] = jnp.where(mask, bi_v, bi_ref[:])
            bj_ref[:] = jnp.where(mask, bj_v, bj_ref[:])
            bw_ref[:] = jnp.where(mask, bw_v, bw_ref[:])
            # hand the accumulator to the next pair of this parity
            sent_full = jnp.full((RBLK2, L), SENT, jnp.int32)
            zero_full = jnp.zeros((RBLK2, L), jnp.int32)
            a0_ref[:] = jnp.where(use0, sent_full, a0_ref[:])
            v0_ref[:] = jnp.where(use0, zero_full, v0_ref[:])
            a1_ref[:] = jnp.where(use0, a1_ref[:], sent_full)
            v1_ref[:] = jnp.where(use0, v1_ref[:], zero_full)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_stats_batch_pallas_pipe2(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
) -> NWStatsResult:
    """v2 pipelined stats aligner (see _make_nw_stats_pipe2_kernel).
    Bit-equal to nw_stats_batch / nw_stats_batch_pallas / ..._pipe."""
    B, L = X.shape
    K = PIPE2_K
    assert L == max_len and L % 128 == 0
    assert B % (RBLK2 * K) == 0, (B, RBLK2, K)
    assert L % UNROLL2 == 0
    R = B // K  # sublane rows; row r streams pairs r*K .. r*K+K-1
    NS = (K + 1) * L
    n_grid = NS // UNROLL2
    grid = (R // RBLK2, n_grid)

    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    xl = xlen.astype(jnp.int32)
    yl = ylen.astype(jnp.int32)

    padL = jnp.zeros((R, L), jnp.int32)
    g3 = lambda a: a.reshape(R, n_grid, UNROLL2).transpose(1, 0, 2)
    fx = g3(jnp.concatenate([Xi.reshape(R, K * L), padL], axis=1))
    fy = g3(jnp.concatenate([Yi.reshape(R, K * L), padL], axis=1))
    rep = lambda v: jnp.repeat(v.reshape(R, K), L, axis=1)
    fy0 = g3(jnp.concatenate([rep(Yi[:, 0]), padL], axis=1))
    fxl_y = g3(jnp.concatenate([rep(xl), padL], axis=1))
    fyl_y = g3(jnp.concatenate([rep(yl), padL], axis=1))
    fxl_o = g3(jnp.concatenate([padL, rep(xl)], axis=1))
    fyl_o = g3(jnp.concatenate([padL, rep(yl)], axis=1))

    kernel = _make_nw_stats_pipe2_kernel(L)
    scr = [pltpu.VMEM((RBLK2, L), jnp.int32)] * 20
    out_shape = tuple(
        jax.ShapeDtypeStruct((R, K), jnp.int32) for _ in range(4)
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, g: (0, 0), memory_space=pltpu.SMEM)
    feedU = lambda: pl.BlockSpec(
        (1, RBLK2, UNROLL2), lambda b, g: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RBLK2, K), lambda b, g: (b, 0), memory_space=pltpu.VMEM
    )
    bs, bi, bj, bw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11,
                  feedU(), feedU(), feedU(), feedU(), feedU(),
                  feedU(), feedU()],
        out_specs=tuple(out_spec for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        fx, fy, fy0, fxl_y, fyl_y, fxl_o, fyl_o,
    )
    return NWStatsResult(
        best_score=bs.reshape(B),
        best_i=bi.reshape(B),
        best_j=bj.reshape(B),
        length=bw.reshape(B) & 0xFFFF,
        identities=bw.reshape(B) >> 16,
    )


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_stats_batch_pallas_pipe(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
) -> NWStatsResult:
    """Pipelined stats aligner: K pairs per sublane row, ~full lane
    occupancy (see _make_nw_stats_pipe_kernel).  Bit-equal to
    nw_stats_batch / nw_stats_batch_pallas."""
    B, L = X.shape
    K = PIPE_K
    assert L == max_len and L % 128 == 0
    assert B % (BBLK * K) == 0, (B, BBLK, K)
    # The v1 pipe kernel steps by UNROLL; its feed/grid layout must match
    # (UNROLL2 is the v2 kernel's independent knob -- do not mix them).
    assert L % UNROLL == 0
    R = B // K  # sublane rows; row r streams pairs r*K .. r*K+K-1
    NS = (K + 1) * L  # total steps (pair K-1 ends at (K+1)L - 2)
    n_grid = NS // UNROLL
    grid = (R // BBLK, n_grid)

    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    xl = xlen.astype(jnp.int32)
    yl = ylen.astype(jnp.int32)

    # Per-row feed streams: entry d of row r belongs to pair r*K + d//L.
    # Laid out (n_grid, R, UNROLL) so each grid step's feed is one legal
    # (1, BBLK, UNROLL) VMEM block (last dim equals the overall dim; a
    # (BBLK, UNROLL) window of a (R, NS) array is an illegal sub-(8,128)
    # tile on real Mosaic).
    padL = jnp.zeros((R, L), jnp.int32)
    g3 = lambda a: a.reshape(R, n_grid, UNROLL).transpose(1, 0, 2)
    fx = g3(jnp.concatenate([Xi.reshape(R, K * L), padL], axis=1))
    fy = g3(jnp.concatenate([Yi.reshape(R, K * L), padL], axis=1))
    rep = lambda v: jnp.repeat(v.reshape(R, K), L, axis=1)
    fy0 = g3(jnp.concatenate([rep(Yi[:, 0]), padL], axis=1))
    fxl_y = g3(jnp.concatenate([rep(xl), padL], axis=1))
    fyl_y = g3(jnp.concatenate([rep(yl), padL], axis=1))
    # old-pair lens: shifted one phase right; first L steps have no old
    # pair (len 0 = all lanes invalid).
    fxl_o = g3(jnp.concatenate([padL, rep(xl)], axis=1))
    fyl_o = g3(jnp.concatenate([padL, rep(yl)], axis=1))

    kernel = _make_nw_stats_pipe_kernel(L)
    scr = [pltpu.VMEM((BBLK, L), jnp.int32)] * 15 + [
        pltpu.VMEM((BBLK, 1), jnp.int32)
    ] * 8
    out_shape = tuple(
        jax.ShapeDtypeStruct((R, K), jnp.int32) for _ in range(4)
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, g: (0, 0), memory_space=pltpu.SMEM)
    feedU = lambda: pl.BlockSpec(
        (1, BBLK, UNROLL), lambda b, g: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (BBLK, K), lambda b, g: (b, 0), memory_space=pltpu.VMEM
    )
    bs, bi, bj, bw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11,
                  feedU(), feedU(), feedU(), feedU(), feedU(),
                  feedU(), feedU()],
        out_specs=tuple(out_spec for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        fx, fy, fy0, fxl_y, fyl_y, fxl_o, fyl_o,
    )
    return NWStatsResult(
        best_score=bs.reshape(B),
        best_i=bi.reshape(B),
        best_j=bj.reshape(B),
        length=bw.reshape(B) & 0xFFFF,
        identities=bw.reshape(B) >> 16,
    )


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_stats_batch_pallas(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
) -> NWStatsResult:
    B, L = X.shape
    assert L == max_len and L % 128 == 0 and B % BBLK == 0
    NDP = 2 * L  # padded diagonal count (multiple of UNROLL)
    grid = (B // BBLK, NDP // UNROLL)

    kernel = _make_nw_stats_kernel(L)
    scr = [pltpu.VMEM((BBLK, L), jnp.int32)] * 16 + [
        pltpu.VMEM((BBLK, 1), jnp.int32)
    ] * 4
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, 1), jnp.int32) for _ in range(4)
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, d: (0, 0), memory_space=pltpu.SMEM)
    vrow = lambda: pl.BlockSpec(
        (BBLK, L), lambda b, d: (b, 0), memory_space=pltpu.VMEM
    )
    vone = lambda: pl.BlockSpec(
        (BBLK, 1), lambda b, d: (b, 0), memory_space=pltpu.VMEM
    )
    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    bs, bi, bj, bw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11, vrow(), vrow(), vrow(), vone(), vone()],
        out_specs=tuple(vone() for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        Xi,
        Xi[:, ::-1],
        Yi[:, ::-1],
        xlen.astype(jnp.int32).reshape(B, 1),
        ylen.astype(jnp.int32).reshape(B, 1),
    )
    return NWStatsResult(
        best_score=bs[:, 0],
        best_i=bi[:, 0],
        best_j=bj[:, 0],
        length=bw[:, 0] & 0xFFFF,
        identities=bw[:, 0] >> 16,
    )


# ---------------------------------------------------------------------------
# v4: dual-block interleaved twin of the v3 kernel (ILP restructure).
#
# The v3 kernel is latency-bound, not op-bound: UNROLL/RBLK/K sweeps are
# flat, feature-stripped probes (no stats, no rolls) move wall <20%, and
# effective issue sits at ~1.6 vreg-ops/cycle -- the wavefront recurrence
# is one long dependency chain per diagonal, so the in-order VPU stalls on
# op latency.  Widening the ops (bigger RBLK2) adds sublane micro-ops
# *within* each op but cannot overlap two dependent ops.  This kernel
# instead processes TWO independent RBLK2-row blocks (disjoint pair
# streams) in one grid step, with their per-diagonal phases emitted
# INTERLEAVED (A-phase, B-phase, A-phase, ...), so consecutive
# instructions belong to independent SSA chains and each chain's op
# latency hides behind the other's issue.  Per-half semantics are exactly
# _make_nw_stats_pipe3_kernel (same masks, same order) => bit-equal.

def _make_nw_stats_pipe4_kernel(max_len: int, n_blk: int = 2,
                                rblk: int = RBLK2):
    L = max_len
    PHASE = L // UNROLL2
    K = PIPE2_K
    HS = tuple(range(n_blk))

    # carried state rows, in scratch order (22 per half)
    _STATE = (
        "s_dm1", "s_dm2", "sR_dm1", "sR_dm2", "sR_dm3",
        "wR_dm1", "wR_dm2", "wR_dm3",
        "mf_s", "mf_xy", "mf_w", "mc_s", "mc_x", "mc_w",
        "yd", "xc", "xlen", "ylen", "acc", "accw", "sta", "stw",
    )

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               bs_ref, bi_ref, bj_ref, bw_ref, *scr):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL2)
        q = g // jnp.int32(PHASE)
        ebase = (g - q * jnp.int32(PHASE)) * jnp.int32(UNROLL2)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rblk, L), 1)
        lane4096 = lane * jnp.int32(4096)
        lane_egap = lane * egap
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)
        SENT = jnp.int32(-(2 ** 31) + 1)
        lane_is0 = lane == 0
        lane_ge2 = lane >= 2
        IE = igap - egap

        def roll1(a):
            return pltpu.roll(a, jnp.int32(1), axis=1)

        def shift1(a, fill):
            return jnp.where(lane_is0, fill, roll1(a))

        refs = {h: dict(zip(_STATE, scr[22 * h: 22 * (h + 1)]))
                for h in HS}

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((rblk, L), NEG, jnp.int32)
            zero = jnp.zeros((rblk, L), jnp.int32)
            sent = jnp.full((rblk, L), SENT, jnp.int32)
            for h in HS:
                rf = refs[h]
                for nm in ("s_dm1", "s_dm2", "sR_dm1", "sR_dm2", "sR_dm3",
                           "mf_s", "mc_s"):
                    rf[nm][:] = neg
                for nm in ("wR_dm1", "wR_dm2", "wR_dm3", "mf_xy", "mf_w",
                           "mc_x", "mc_w", "yd", "xc", "xlen", "ylen",
                           "accw", "stw"):
                    rf[nm][:] = zero
                rf["acc"][:] = sent
                rf["sta"][:] = sent

        # load carried state + feed blocks once per grid step, per half
        st = {h: {nm: refs[h][nm][:] for nm in _STATE} for h in HS}
        lo = {h: slice(h * rblk, (h + 1) * rblk) for h in HS}
        fd = {
            h: dict(
                fx=fx_ref[0, lo[h], :], fy=fy_ref[0, lo[h], :],
                fy0=fy0_ref[0, lo[h], :], fxl=fxl_y_ref[0, lo[h], :],
                fyl=fyl_y_ref[0, lo[h], :],
            )
            for h in HS
        }

        for u in range(UNROLL2):
            e = ebase + jnp.int32(u)
            young = lane <= e
            j_idx = (e - lane) + jnp.where(young, Z32, jnp.int32(L))
            eq_e = lane == e
            bmask = lane_is0 | eq_e
            jge2 = j_idx >= 2
            lanej = lane4096 + j_idx
            lj = lane + j_idx  # = d_loc, shared by both halves
            t = {h: {} for h in HS}

            def p_feed(s, t, f):
                t["x_new"] = f["fx"][:, u : u + 1]
                t["y_new"] = f["fy"][:, u : u + 1]
                t["y0"] = f["fy0"][:, u : u + 1]
                t["xl_y"] = f["fxl"][:, u : u + 1]
                t["yl_y"] = f["fyl"][:, u : u + 1]

            def p_handover(s, t, f):
                s["sta"] = jnp.where(eq_e, s["acc"], s["sta"])
                s["stw"] = jnp.where(eq_e, s["accw"], s["stw"])
                s["acc"] = jnp.where(eq_e, SENT, s["acc"])
                s["xc"] = jnp.where(eq_e, t["x_new"], s["xc"])
                s["xlen"] = jnp.where(eq_e, t["xl_y"], s["xlen"])
                s["ylen"] = jnp.where(eq_e, t["yl_y"], s["ylen"])
                s["yd"] = shift1(s["yd"], t["y_new"])

            def p_masks(s, t, f):
                valid = (lane < s["xlen"]) & (j_idx < s["ylen"])
                border = valid & bmask
                t["valid"] = valid
                t["border"] = border
                t["inner"] = valid ^ border
                is_match = s["xc"] == s["yd"]
                t["s_pm"] = jnp.where(is_match, P4, M4)
                t["diag_add"] = jnp.where(
                    is_match, jnp.int32((1 << 16) + 1), ONE
                )
                t["t_im2_jm1"] = roll1(s["sR_dm3"])
                t["w_im2_jm1"] = roll1(s["wR_dm3"])

            def p_mf(s, t, f):
                ij2 = t["inner"] & jge2
                t["ij2"] = ij2
                mf_upd = ij2 & (s["mf_s"] <= s["s_dm2"])
                s["mf_s"] = jnp.where(mf_upd, s["sR_dm3"], s["mf_s"])
                s["mf_xy"] = jnp.where(
                    mf_upd, lanej - jnp.int32(4098), s["mf_xy"]
                )
                s["mf_w"] = jnp.where(mf_upd, s["wR_dm3"], s["mf_w"])

            def p_scores(s, t, f):
                s_pm = t["s_pm"]
                score_diag = s["sR_dm2"] + s_pm
                dxy = lanej - s["mf_xy"]
                dyl = dxy & jnp.int32(4095)
                dxl = dxy >> jnp.int32(12)
                t["dyl"], t["dxl"] = dyl, dxl
                score_left = jnp.where(
                    jge2, s["mf_s"] + IE + dyl * egap + s_pm, NEG32
                )
                score_right = jnp.where(
                    lane_ge2,
                    (s["mc_s"] + IE - s["mc_x"] * egap) + lane_egap + s_pm,
                    NEG32,
                )
                pick_diag = (score_diag >= score_left) & (
                    score_diag >= score_right
                )
                pick_right = (~pick_diag) & (score_right > score_left)
                t["pick_diag"], t["pick_right"] = pick_diag, pick_right
                t["cell"] = jnp.where(
                    pick_diag, score_diag,
                    jnp.where(pick_right, score_right, score_left),
                )

            def p_w(s, t, f):
                dxl, dyl = t["dxl"], t["dyl"]
                add_left = jnp.where(dxl > dyl, dxl, dyl)
                dxr = lane - s["mc_x"]
                add_right = jnp.where(dxr > 1, dxr, ONE)
                w_new = jnp.where(
                    t["pick_diag"],
                    s["wR_dm2"] + t["diag_add"],
                    jnp.where(
                        t["pick_right"],
                        s["mc_w"] + add_right,
                        s["mf_w"] + add_left,
                    ),
                )
                cell = jnp.where(t["border"], t["s_pm"], t["cell"])
                t["s0"] = jnp.where(t["valid"], cell, NEG32)
                t["w0"] = jnp.where(t["inner"], w_new, Z32)

            def p_mc(s, t, f):
                mc_upd = t["ij2"] & lane_ge2 & (t["t_im2_jm1"] > s["mc_s"])
                s["mc_s"] = jnp.where(mc_upd, t["t_im2_jm1"], s["mc_s"])
                s["mc_x"] = jnp.where(mc_upd, lane - jnp.int32(2), s["mc_x"])
                s["mc_w"] = jnp.where(mc_upd, t["w_im2_jm1"], s["mc_w"])
                col0_ok = t["xl_y"] > e
                col0_score = jnp.where(t["x_new"] == t["y0"], P4, M4)
                upd_col = eq_e & col0_ok
                s["mf_s"] = jnp.where(upd_col, col0_score, s["mf_s"])
                s["mf_xy"] = jnp.where(upd_col, lane4096, s["mf_xy"])
                s["mf_w"] = jnp.where(upd_col, Z32, s["mf_w"])

            def p_adv(s, t, f):
                row0_ok = t["yl_y"] > e
                new_col_s = jnp.where(row0_ok, t["s0"][:, 0:1], NEG32)
                s["mc_s"] = shift1(s["mc_s"], new_col_s)
                s["mc_x"] = shift1(s["mc_x"], Z32)
                s["mc_w"] = shift1(s["mc_w"], Z32)
                elig = t["inner"] & (
                    (lane == s["xlen"] - 1) | (j_idx == s["ylen"] - 1)
                )
                packed = (t["s0"] << jnp.int32(13)) | lj
                npm = jnp.where(elig, packed, SENT)
                upd = npm > s["acc"]
                s["acc"] = jnp.where(upd, npm, s["acc"])
                s["accw"] = jnp.where(upd, t["w0"], s["accw"])

            def p_rot(s, t, f):
                s["s_dm2"] = s["s_dm1"]
                s["s_dm1"] = t["s0"]
                s["sR_dm3"] = s["sR_dm2"]
                s["sR_dm2"] = s["sR_dm1"]
                s["sR_dm1"] = roll1(t["s0"])
                s["wR_dm3"] = s["wR_dm2"]
                s["wR_dm2"] = s["wR_dm1"]
                s["wR_dm1"] = roll1(t["w0"])

            for ph in (p_feed, p_handover, p_masks, p_mf, p_scores,
                       p_w, p_mc, p_adv, p_rot):
                for h in HS:
                    ph(st[h], t[h], fd[h])

        for h in HS:
            for nm in _STATE:
                refs[h][nm][:] = st[h][nm]

        @pl.when((ebase == jnp.int32(L - UNROLL2)) & (q >= 1))
        def _flush():
            slot = q - jnp.int32(1)
            kiota = jax.lax.broadcasted_iota(
                jnp.int32, (n_blk * rblk, K), 1
            )
            mask = kiota == slot
            vals = {"bs": [], "bi": [], "bj": [], "bw": []}
            for h in HS:
                Ap = refs[h]["sta"][:]
                Wp = refs[h]["stw"][:]
                amax = jnp.max(Ap, axis=1, keepdims=True)
                any_ = amax != SENT
                s_l = Ap >> jnp.int32(13)
                smax = amax >> jnp.int32(13)
                bi_v = jnp.max(
                    jnp.where(s_l == smax, lane, jnp.int32(-1)),
                    axis=1, keepdims=True,
                )
                at = lane == bi_v
                dsel = jnp.sum(
                    jnp.where(at, Ap & jnp.int32(8191), Z32),
                    axis=1, keepdims=True,
                )
                wsel = jnp.sum(
                    jnp.where(at, Wp, Z32), axis=1, keepdims=True
                )
                vals["bs"].append(jnp.where(any_, smax, SENT))
                vals["bi"].append(jnp.where(any_, bi_v, Z32))
                vals["bj"].append(jnp.where(any_, dsel - bi_v, Z32))
                vals["bw"].append(jnp.where(any_, wsel, Z32))
            for nm, ref in (("bs", bs_ref), ("bi", bi_ref),
                            ("bj", bj_ref), ("bw", bw_ref)):
                full = jnp.concatenate(vals[nm], axis=0)  # (2*RBLK2, 1)
                ref[:] = jnp.where(mask, full, ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_len", "interpret", "n_blk", "rblk")
)
def nw_stats_batch_pallas_pipe4(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
    n_blk: int = 2,
    rblk: int = RBLK2,
) -> NWStatsResult:
    """v4 multi-block interleaved stats aligner (see
    _make_nw_stats_pipe4_kernel).  Bit-equal to nw_stats_batch and the
    v1/v2/v3 Pallas kernels; requires B % (n_blk*rblk*PIPE2_K) == 0."""
    B, L = X.shape
    K = PIPE2_K
    R2 = n_blk * rblk
    assert L == max_len and L % 128 == 0
    assert B % (R2 * K) == 0, (B, R2, K)
    assert L % UNROLL2 == 0
    R = B // K
    NS = (K + 1) * L
    n_grid = NS // UNROLL2
    grid = (R // R2, n_grid)

    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    xl = xlen.astype(jnp.int32)
    yl = ylen.astype(jnp.int32)

    padL = jnp.zeros((R, L), jnp.int32)
    g3 = lambda a: a.reshape(R, n_grid, UNROLL2).transpose(1, 0, 2)
    fx = g3(jnp.concatenate([Xi.reshape(R, K * L), padL], axis=1))
    fy = g3(jnp.concatenate([Yi.reshape(R, K * L), padL], axis=1))
    rep = lambda v: jnp.repeat(v.reshape(R, K), L, axis=1)
    fy0 = g3(jnp.concatenate([rep(Yi[:, 0]), padL], axis=1))
    fxl_y = g3(jnp.concatenate([rep(xl), padL], axis=1))
    fyl_y = g3(jnp.concatenate([rep(yl), padL], axis=1))

    kernel = _make_nw_stats_pipe4_kernel(L, n_blk, rblk)
    scr = [pltpu.VMEM((rblk, L), jnp.int32)] * (22 * n_blk)
    out_shape = tuple(
        jax.ShapeDtypeStruct((R, K), jnp.int32) for _ in range(4)
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, g: (0, 0), memory_space=pltpu.SMEM)
    feedU = lambda: pl.BlockSpec(
        (1, R2, UNROLL2), lambda b, g: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (R2, K), lambda b, g: (b, 0), memory_space=pltpu.VMEM
    )
    bs, bi, bj, bw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11,
                  feedU(), feedU(), feedU(), feedU(), feedU()],
        out_specs=tuple(out_spec for _ in range(4)),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        fx, fy, fy0, fxl_y, fyl_y,
    )
    return NWStatsResult(
        best_score=bs.reshape(B),
        best_i=bi.reshape(B),
        best_j=bj.reshape(B),
        length=bw.reshape(B) & 0xFFFF,
        identities=bw.reshape(B) >> 16,
    )


# ---------------------------------------------------------------------------
# Streamed forward+bp kernel ("pipe5"): the render path's backpointer
# producer rebuilt on the v3 stats kernel's architecture.
#
# The v1 forward kernel (_make_nw_kernel) predates the v2/v3 redesigns:
# one pair block per 8 sublanes, rotating char feeds re-rolled through
# VMEM refs every diagonal, per-step masked best reductions -- measured
# ~4.6 effective GCUPS while the v3/v4 stats kernels do 17-25.  This
# kernel keeps v3's K-pair-per-row streamed layout, registerized carried
# state and harvest-at-handover best fold, and ADDs what the render path
# needs: the packed from-cell word per cell (diag/right/left move --
# left is exactly the carried mf_xy since PACK == 4096) plus the
# diagonal-run compression fields (run length + matches, RUN_CAP=15)
# that ops/traceback.py consumes.
#
# bp layout is the STREAM layout [R, (K+1)*L, L]: pair b = r*K + k has
# its cell (i, j) at bp[r, k*L + i + j, i] (each stream step's row mixes
# pairs, but per pair the map is a pure offset k*L on the diagonal
# index).  Total bp memory is (K+1)/(2K) ~= half of the per-pair
# [B, 2L, L] layout.  traceback_batch_stream indexes it directly.

def _make_nw_fwd_pipe5_kernel(max_len: int):
    L = max_len
    PHASE = L // UNROLL2
    K = PIPE2_K

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               bp_ref, bs_ref, bi_ref, bj_ref,
               sb1, sb2, sbR1, sbR2, sbR3,
               rnR1, rnR2, mrR1, mrR2,
               mfs_ref, mfxy_ref, mcs_ref, mcx_ref,
               yd_ref, xc_ref, xl_ref, yl_ref,
               acc_ref, sta_ref):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL2)
        q = g // jnp.int32(PHASE)
        ebase = (g - q * jnp.int32(PHASE)) * jnp.int32(UNROLL2)
        igap = igap_ref[0, 0]
        egap = egap_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, L), 1)
        lane4096 = lane * jnp.int32(4096)
        lane_egap = lane * egap
        NEG32 = jnp.int32(NEG)
        P4 = jnp.int32(POINT)
        M4 = jnp.int32(-POINT)
        Z32 = jnp.int32(0)
        ONE = jnp.int32(1)
        SENT = jnp.int32(-(2 ** 31) + 1)
        lane_is0 = lane == 0
        lane_ge2 = lane >= 2
        IE = igap - egap

        def roll1(a):
            return pltpu.roll(a, jnp.int32(1), axis=1)

        def shift1(a, fill):
            return jnp.where(lane_is0, fill, roll1(a))

        @pl.when(dbase == 0)
        def _init():
            neg = jnp.full((RBLK2, L), NEG, jnp.int32)
            zero = jnp.zeros((RBLK2, L), jnp.int32)
            sent = jnp.full((RBLK2, L), SENT, jnp.int32)
            for ref in (sb1, sb2, sbR1, sbR2, sbR3, mfs_ref, mcs_ref):
                ref[:] = neg
            for ref in (rnR1, rnR2, mrR1, mrR2, mfxy_ref, mcx_ref,
                        yd_ref, xc_ref, xl_ref, yl_ref):
                ref[:] = zero
            acc_ref[:] = sent
            sta_ref[:] = sent

        s_dm1 = sb1[:]
        s_dm2 = sb2[:]
        sR_dm1 = sbR1[:]
        sR_dm2 = sbR2[:]
        sR_dm3 = sbR3[:]
        rnR_dm1 = rnR1[:]
        rnR_dm2 = rnR2[:]
        mrR_dm1 = mrR1[:]
        mrR_dm2 = mrR2[:]
        mf_s = mfs_ref[:]
        mf_xy = mfxy_ref[:]
        mc_s = mcs_ref[:]
        mc_x = mcx_ref[:]
        yd = yd_ref[:]
        xc = xc_ref[:]
        xlen = xl_ref[:]
        ylen = yl_ref[:]
        acc = acc_ref[:]
        sta = sta_ref[:]

        bp_rows = []
        for u in range(UNROLL2):
            e = ebase + jnp.int32(u)
            s2 = s_dm2
            x_new = fx_ref[0, :, u : u + 1]
            y_new = fy_ref[0, :, u : u + 1]
            y0 = fy0_ref[0, :, u : u + 1]
            xl_y = fxl_y_ref[0, :, u : u + 1]
            yl_y = fyl_y_ref[0, :, u : u + 1]
            young = lane <= e
            j_idx = (e - lane) + jnp.where(young, Z32, jnp.int32(L))
            eq_e = lane == e

            sta = jnp.where(eq_e, acc, sta)
            acc = jnp.where(eq_e, SENT, acc)
            xc = jnp.where(eq_e, x_new, xc)
            xlen = jnp.where(eq_e, xl_y, xlen)
            ylen = jnp.where(eq_e, yl_y, ylen)
            yd = shift1(yd, y_new)

            valid = (lane < xlen) & (j_idx < ylen)
            bmask = lane_is0 | eq_e
            border = valid & bmask
            inner = valid ^ border
            is_match = xc == yd
            s_pm = jnp.where(is_match, P4, M4)

            t_im1_jm1 = sR_dm2
            t_i_jm2 = s2
            t_im1_jm2 = sR_dm3
            t_im2_jm1 = roll1(sR_dm3)
            run_prev = rnR_dm2
            mr_prev = mrR_dm2

            lanej = lane4096 + j_idx
            jge2 = j_idx >= 2
            ij2 = inner & jge2
            mf_upd = ij2 & (mf_s <= t_i_jm2)
            mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
            mf_xy = jnp.where(mf_upd, lanej - jnp.int32(4098), mf_xy)

            score_diag = t_im1_jm1 + s_pm
            dxy = lanej - mf_xy
            dyl = dxy & jnp.int32(4095)
            score_left = jnp.where(
                jge2, mf_s + IE + dyl * egap + s_pm, NEG32
            )
            score_right = jnp.where(
                lane_ge2,
                (mc_s + IE - mc_x * egap) + lane_egap + s_pm,
                NEG32,
            )
            pick_diag = (score_diag >= score_left) & (
                score_diag >= score_right
            )
            pick_right = (~pick_diag) & (score_right > score_left)
            cell = jnp.where(
                pick_diag, score_diag,
                jnp.where(pick_right, score_right, score_left),
            )

            # packed from-cell of this cell's move (PACK == 4096):
            #   diag  -> (i-1, j-1) = lanej - 4097
            #   right -> (mc_x, j-1) = mc_x*4096 + j - 1
            #   left  -> (mf_x, mf_y) = mf_xy
            frm = jnp.where(
                pick_diag,
                lanej - jnp.int32(4097),
                jnp.where(
                    pick_right,
                    mc_x * jnp.int32(4096) + j_idx - ONE,
                    mf_xy,
                ),
            )

            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)

            # diagonal-run compression fields (ops/nw.py BP layout)
            is_diag = pick_diag & inner
            capped = run_prev == jnp.int32(RUN_CAP)
            match_i = jnp.where(is_match, ONE, Z32)
            run_cur = jnp.where(
                is_diag, jnp.where(capped, ONE, run_prev + ONE), Z32
            )
            mr_cur = jnp.where(
                is_diag,
                jnp.where(capped, match_i, mr_prev + match_i),
                Z32,
            )
            bp_rows.append(
                jnp.where(
                    inner,
                    frm
                    | (run_cur << jnp.int32(24))
                    | (mr_cur << jnp.int32(28)),
                    jnp.int32(-1),
                )
            )

            mc_upd = ij2 & lane_ge2 & (t_im2_jm1 > mc_s)
            mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
            mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)

            col0_ok = xl_y > e
            col0_score = jnp.where(x_new == y0, P4, M4)
            upd_col = eq_e & col0_ok
            mf_s = jnp.where(upd_col, col0_score, mf_s)
            mf_xy = jnp.where(upd_col, lane4096, mf_xy)

            row0_ok = yl_y > e
            new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
            mc_s = shift1(mc_s, new_col_s)
            mc_x = shift1(mc_x, Z32)

            elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
            packed = (s0 << jnp.int32(13)) | (lane + j_idx)
            npm = jnp.where(elig, packed, SENT)
            upd = npm > acc
            acc = jnp.where(upd, npm, acc)

            s_dm2 = s_dm1
            s_dm1 = s0
            sR_dm3 = sR_dm2
            sR_dm2 = sR_dm1
            sR_dm1 = roll1(s0)
            rnR_dm2 = rnR_dm1
            rnR_dm1 = roll1(run_cur)
            mrR_dm2 = mrR_dm1
            mrR_dm1 = roll1(mr_cur)

        bp_ref[:] = jnp.stack(bp_rows, axis=1)  # (RBLK2, UNROLL2, L)

        sb1[:] = s_dm1
        sb2[:] = s_dm2
        sbR1[:] = sR_dm1
        sbR2[:] = sR_dm2
        sbR3[:] = sR_dm3
        rnR1[:] = rnR_dm1
        rnR2[:] = rnR_dm2
        mrR1[:] = mrR_dm1
        mrR2[:] = mrR_dm2
        mfs_ref[:] = mf_s
        mfxy_ref[:] = mf_xy
        mcs_ref[:] = mc_s
        mcx_ref[:] = mc_x
        yd_ref[:] = yd
        xc_ref[:] = xc
        xl_ref[:] = xlen
        yl_ref[:] = ylen
        acc_ref[:] = acc
        sta_ref[:] = sta

        @pl.when((ebase == jnp.int32(L - UNROLL2)) & (q >= 1))
        def _flush():
            Ap = sta_ref[:]
            amax = jnp.max(Ap, axis=1, keepdims=True)
            any_ = amax != SENT
            s_l = Ap >> jnp.int32(13)
            smax = amax >> jnp.int32(13)
            bi = jnp.max(
                jnp.where(s_l == smax, lane, jnp.int32(-1)),
                axis=1, keepdims=True,
            )
            at = lane == bi
            dsel = jnp.sum(
                jnp.where(at, Ap & jnp.int32(8191), Z32),
                axis=1, keepdims=True,
            )
            bs_v = jnp.where(any_, smax, SENT)
            bi_v = jnp.where(any_, bi, Z32)
            bj_v = jnp.where(any_, dsel - bi, Z32)
            slot = q - jnp.int32(1)
            kiota = jax.lax.broadcasted_iota(jnp.int32, (RBLK2, K), 1)
            mask = kiota == slot
            bs_ref[:] = jnp.where(mask, bs_v, bs_ref[:])
            bi_ref[:] = jnp.where(mask, bi_v, bi_ref[:])
            bj_ref[:] = jnp.where(mask, bj_v, bj_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def nw_forward_batch_pallas_pipe5(
    X: jax.Array,  # [B, L] uint8 codes
    Y: jax.Array,
    xlen: jax.Array,  # [B]
    ylen: jax.Array,
    igap,
    egap,
    *,
    max_len: int,
    interpret: bool = False,
):
    """Streamed forward aligner with bp emission (see
    _make_nw_fwd_pipe5_kernel).  Returns (bp_stream [R, (K+1)L, L],
    best_score, best_i, best_j); requires B % (RBLK2*PIPE2_K) == 0.
    Consume bp via traceback_batch_stream (ops/traceback.py)."""
    B, L = X.shape
    K = PIPE2_K
    assert L == max_len and L % 128 == 0
    assert B % (RBLK2 * K) == 0, (B, RBLK2, K)
    assert L % UNROLL2 == 0
    R = B // K
    NS = (K + 1) * L
    n_grid = NS // UNROLL2
    grid = (R // RBLK2, n_grid)

    Xi = X.astype(jnp.int32)
    Yi = Y.astype(jnp.int32)
    xl = xlen.astype(jnp.int32)
    yl = ylen.astype(jnp.int32)

    padL = jnp.zeros((R, L), jnp.int32)
    g3 = lambda a: a.reshape(R, n_grid, UNROLL2).transpose(1, 0, 2)
    fx = g3(jnp.concatenate([Xi.reshape(R, K * L), padL], axis=1))
    fy = g3(jnp.concatenate([Yi.reshape(R, K * L), padL], axis=1))
    rep = lambda v: jnp.repeat(v.reshape(R, K), L, axis=1)
    fy0 = g3(jnp.concatenate([rep(Yi[:, 0]), padL], axis=1))
    fxl_y = g3(jnp.concatenate([rep(xl), padL], axis=1))
    fyl_y = g3(jnp.concatenate([rep(yl), padL], axis=1))

    kernel = _make_nw_fwd_pipe5_kernel(L)
    scr = [pltpu.VMEM((RBLK2, L), jnp.int32)] * 19
    out_shape = (
        jax.ShapeDtypeStruct((R, NS, L), jnp.int32),
        jax.ShapeDtypeStruct((R, K), jnp.int32),
        jax.ShapeDtypeStruct((R, K), jnp.int32),
        jax.ShapeDtypeStruct((R, K), jnp.int32),
    )
    smem11 = pl.BlockSpec((1, 1), lambda b, g: (0, 0), memory_space=pltpu.SMEM)
    feedU = lambda: pl.BlockSpec(
        (1, RBLK2, UNROLL2), lambda b, g: (g, b, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RBLK2, K), lambda b, g: (b, 0), memory_space=pltpu.VMEM
    )
    bp, bs, bi, bj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem11, smem11,
                  feedU(), feedU(), feedU(), feedU(), feedU()],
        out_specs=(
            pl.BlockSpec(
                (RBLK2, UNROLL2, L),
                lambda b, g: (b, g, 0),
                memory_space=pltpu.VMEM,
            ),
            out_spec, out_spec, out_spec,
        ),
        out_shape=out_shape,
        scratch_shapes=scr,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(igap, jnp.int32).reshape(1, 1),
        jnp.asarray(egap, jnp.int32).reshape(1, 1),
        fx, fy, fy0, fxl_y, fyl_y,
    )
    return bp, bs.reshape(B), bi.reshape(B), bj.reshape(B)
