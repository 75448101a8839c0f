"""NW stats kernel cost-center probe (dev tool, not the driver bench).

Times feature-stripped variants of the pipe2 wavefront kernel on the real
TPU to locate where the cycles go (the VERDICT-r3 question: sustained
~8 GCUPS vs a ~77 Gcell/s VPU estimate).  The stripped variants produce
WRONG results -- they exist only to measure the marginal cost of each
feature block:

  full      production _make_nw_stats_pipe2_kernel
  nostats   w (path-stats) machinery removed
  nobest    per-step best-cell accumulators removed
  nogap     mf/mc nonlocal gap trackers removed (diag-only recurrence)
  skeleton  diag recurrence + rolls + stores only
  noroll    skeleton with the cross-lane rolls replaced by identity

Usage: python bench_kernel.py [B] [L] [reps]
"""

import sys
import time

import numpy as np


def make_variant_kernel(max_len, *, stats=True, best=True, gap=True,
                        rolls=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from imsame_tpu.constants import POINT
    from imsame_tpu.ops.nw_pallas import NEG, PIPE2_K, RBLK2, UNROLL2

    L = max_len
    PHASE = L // UNROLL2
    K = PIPE2_K

    def kernel(igap_ref, egap_ref,
               fx_ref, fy_ref, fy0_ref, fxl_y_ref, fyl_y_ref,
               fxl_o_ref, fyl_o_ref,
               bs_ref, bi_ref, bj_ref, bw_ref,
               sb0, sb1, sb2, sb3, wb0, wb1, wb2, wb3,
               mfs_ref, mfxy_ref, mfw_ref, mcs_ref, mcx_ref, mcw_ref,
               yd_ref, xc_ref, a0_ref, a1_ref, v0_ref, v1_ref):
        g = pl.program_id(1)
        dbase = g * jnp.int32(UNROLL2)
        q = g // jnp.int32(PHASE)
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
            if not rolls:
                return jnp.where(lane == 0, fill, a)
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
            s2 = sbufs[(u + 2) % 4][:]
            s3 = sbufs[(u + 1) % 4][:]
            x_new = fx_ref[0, :, u : u + 1]
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

            t_im1_jm1 = shift1(s2, NEG32)
            t_i_jm2 = s2
            sh_s3 = shift1(s3, NEG32)
            t_im1_jm2 = sh_s3
            t_im2_jm1 = shift1(sh_s3, NEG32)

            score_diag = t_im1_jm1 + s_pm
            if gap:
                w2 = wbufs[(u + 2) % 4][:]
                w3 = wbufs[(u + 1) % 4][:]
                if stats:
                    w_im1_jm1 = shift1(w2, Z32)
                    w_im1_jm2 = shift1(w3, Z32)
                    w_im2_jm1 = shift1(w_im1_jm2, Z32)
                mf_s = mfs_ref[:]
                mf_xy = mfxy_ref[:]
                lanej = lane4096 + j_idx
                mf_upd = (
                    valid & (lane >= 1) & (j_idx >= 2) & (mf_s <= t_i_jm2)
                )
                mf_s = jnp.where(mf_upd, t_im1_jm2, mf_s)
                mf_xy = jnp.where(mf_upd, lanej - jnp.int32(4098), mf_xy)
                mc_s = mcs_ref[:]
                mc_x = mcx_ref[:]
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
            else:
                pick_diag = score_diag >= NEG32
                cell = score_diag

            if stats:
                diag_add = jnp.where(
                    is_match, jnp.int32((1 << 16) + 1), ONE
                )
                if gap:
                    mf_w = mfw_ref[:]
                    mf_w = jnp.where(mf_upd, w_im1_jm2, mf_w)
                    mc_w = mcw_ref[:]
                    add_left = jnp.where(dxl > dyl, dxl, dyl)
                    dxr = lane - mc_x
                    add_right = jnp.where(dxr > 1, dxr, ONE)
                    w_new = jnp.where(
                        pick_diag,
                        w_im1_jm1 + diag_add,
                        jnp.where(
                            pick_right, mc_w + add_right, mf_w + add_left
                        ),
                    )
                else:
                    w_new = shift1(wbufs[(u + 2) % 4][:], Z32) + diag_add

            border = valid & ((lane == 0) | (j_idx == 0))
            cell = jnp.where(border, s_pm, cell)
            s0 = jnp.where(valid, cell, NEG32)
            if stats:
                w0 = jnp.where(inner, w_new, Z32)
            else:
                w0 = s0

            if gap:
                mc_upd = (
                    inner & (lane >= 2) & (j_idx >= 2) & (t_im2_jm1 > mc_s)
                )
                mc_s = jnp.where(mc_upd, t_im2_jm1, mc_s)
                mc_x = jnp.where(mc_upd, lane - jnp.int32(2), mc_x)
                if stats:
                    mc_w = jnp.where(mc_upd, w_im2_jm1, mc_w)

                col0_ok = fxl_y_ref[0, :, u : u + 1] > e
                col0_score = jnp.where(x_new == y0, P4, M4)
                upd_col = eq_e & col0_ok
                mf_s = jnp.where(upd_col, col0_score, mf_s)
                mf_xy = jnp.where(upd_col, lane4096, mf_xy)
                mfs_ref[:] = mf_s
                mfxy_ref[:] = mf_xy
                if stats:
                    mf_w = jnp.where(upd_col, Z32, mf_w)
                    mfw_ref[:] = mf_w

                row0_ok = fyl_y_ref[0, :, u : u + 1] > e
                new_col_s = jnp.where(row0_ok, s0[:, 0:1], NEG32)
                mcs_ref[:] = shift1(mc_s, new_col_s)
                mcx_ref[:] = shift1(mc_x, Z32)
                if stats:
                    mcw_ref[:] = shift1(mc_w, Z32)

            if best:
                elig = inner & ((lane == xlen - 1) | (j_idx == ylen - 1))
                packed = (s0 << jnp.int32(13)) | (lane + j_idx)
                npm = jnp.where(elig, packed, SENT)
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
            if stats:
                wbufs[u % 4][:] = w0

        @pl.when((ebase == jnp.int32(L - UNROLL2)) & (q >= 1))
        def _flush():
            oldpar = (q - jnp.int32(1)) & jnp.int32(1)
            use0 = oldpar == 0
            Ap = jnp.where(use0, a0_ref[:], a1_ref[:])
            Wp = jnp.where(use0, v0_ref[:], v1_ref[:])
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
            sent_full = jnp.full((RBLK2, L), SENT, jnp.int32)
            zero_full = jnp.zeros((RBLK2, L), jnp.int32)
            a0_ref[:] = jnp.where(use0, sent_full, a0_ref[:])
            v0_ref[:] = jnp.where(use0, zero_full, v0_ref[:])
            a1_ref[:] = jnp.where(use0, a1_ref[:], sent_full)
            v1_ref[:] = jnp.where(use0, v1_ref[:], zero_full)

    return kernel


def run_variant(name, kernel_override, B, L, reps):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import imsame_tpu.ops.nw_pallas as nwp

    rng = np.random.default_rng(0)
    X = rng.integers(0, 4, (B, L)).astype(np.uint8)
    Y = rng.integers(0, 4, (B, L)).astype(np.uint8)
    xlen = np.full(B, L - 6, np.int32)
    ylen = np.full(B, L - 6, np.int32)

    orig = nwp._make_nw_stats_pipe2_kernel
    if kernel_override is not None:
        nwp._make_nw_stats_pipe2_kernel = lambda ml: kernel_override
    # the wrapper is jit-cached on shapes only: clear it so the variant
    # kernel actually compiles (a cache hit would silently re-time the
    # previously built kernel)
    nwp.nw_stats_batch_pallas_pipe2._clear_cache()
    try:
        fn = nwp.nw_stats_batch_pallas_pipe2
        args = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xlen),
                jnp.asarray(ylen), -5, -2)
        out = fn(*args, max_len=L)
        np.asarray(out.best_score)  # warm + sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, max_len=L)
        np.asarray(out.best_score)
        dt = (time.perf_counter() - t0) / reps
    finally:
        nwp._make_nw_stats_pipe2_kernel = orig
    cells = B * (L - 6) * (L - 6)
    gcups = cells / dt / 1e9
    print(f"{name:10s} {dt*1e3:8.2f} ms  {gcups:7.2f} GCUPS")
    return gcups


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"B={B} L={L} reps={reps}")
    run_variant("full", None, B, L, reps)
    run_variant("full2", make_variant_kernel(L), B, L, reps)
    run_variant("nostats", make_variant_kernel(L, stats=False), B, L, reps)
    run_variant("nobest", make_variant_kernel(L, best=False), B, L, reps)
    run_variant("nogap", make_variant_kernel(L, gap=False), B, L, reps)
    run_variant(
        "skeleton",
        make_variant_kernel(L, stats=False, best=False, gap=False),
        B, L, reps,
    )
    run_variant(
        "noroll",
        make_variant_kernel(
            L, stats=False, best=False, gap=False, rolls=False
        ),
        B, L, reps,
    )


if __name__ == "__main__":
    main()
