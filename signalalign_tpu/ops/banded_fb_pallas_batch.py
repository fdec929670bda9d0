"""Lane-batched Pallas wavefront kernels: S reads per vector lane.

The v1 x-frame kernels (banded_fb_pallas.py) process one read per grid
row with (1, WB) diagonal tensors — 1/8 sublane occupancy and ~WB/128
lane tiles per op, so the VPU runs at a few percent utilization. This v2
transposes the layout:

    diagonal state tensor = (WB sublanes, S lanes),  S reads per group

so every VPU op processes S reads' cells at full tile occupancy. The
x-frame properties carry over with axes swapped:

  * neighbor cells (x-1) are static -1 SUBLANE shifts;
  * per-read per-diagonal scalars (band offset, width, event inserts,
    transitions) are (1, S) lane vectors read from (..., T, S) blocked
    inputs (the dynamic step index rides the sublane axis);
  * ring re-basing at tile boundaries selects among static sublane shifts
    with per-read (1, S) predicates;
  * the big per-diagonal outputs (normalized match rows / fused log
    posterior) stream to untiled HBM refs through double-buffered manual
    DMA, so tile length T is not limited by VMEM output blocks.

Ring keeps only the rows the recurrence reads: M/X/Y of diagonal d-1 and
M of d-2 (plus the row being written) -> 7 rows.

Semantics identical to banded_fb._banded_sweeps_core (validated against
the float64 oracle and upstream golden TSVs). P=1, MODE_MEAN_ONLY.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from signalalign_tpu.ops import banded_fb as bfb
from signalalign_tpu.ops.banded_fb import (NEG, T_MM, T_MX, T_MY, T_XM,
                                           T_XX, T_YM, T_YY)
from signalalign_tpu.ops.banded_fb_pallas import (G_DK, G_DKB, G_ISEND,
                                                  G_ISSTART, G_JINS,
                                                  G_JINSB, G_WIDTH,
                                                  G_XOFF, NGEOM,
                                                  tile_geometry)

NREF = 5
NEV = 3   # mean, valid, best-case log-emission offset
SUBPAD = 8
RING_ROWS = 9  # 3 rotating diagonal slots x 3 states

# The big per-diagonal stacks (forward match rows, fused log-posterior)
# stream to HBM as u16 fixed point: log values in [-128, 0] at 1/512 nat
# resolution (=> <0.2% relative posterior error, an order under the
# reference's own output approximation). Halves both HBM footprint (the
# capacity limit for long reads at 128 lanes) and stack DMA traffic.
# 65535 (the -128 clamp) doubles as the "effectively -inf" sentinel.
QSCALE = 512.0
QMAX = 65535

# Probability-space DP scale center: each diagonal's max is rescaled to
# 2^100 instead of 1.0, so f32's exponent range covers cells down to
# ~157 nats BELOW the ridge (2^-126 normals) before flush-to-zero —
# single-scale (max = 1) ran out at 87 nats, which real reads exceed
# (band cells legitimately dip ~100+ nats under the ridge and later
# rejoin it). Headroom above the ridge (2^27) absorbs pre-rescale
# overshoot. All offset traces subtract LOG_SCALE so downstream
# consumers see the same log-offset contract as the log-space kernels.
SCALE = float(2.0 ** 100)
INV_SCALE = float(2.0 ** -100)
LOG_SCALE = float(100.0 * np.log(2.0))


def _quant_rows(v):
    # Mosaic lacks direct f32<->u16 casts; hop through i32
    q = jnp.minimum(jnp.round(jnp.maximum(-v, 0.0) * QSCALE), QMAX)
    return q.astype(jnp.int32).astype(jnp.uint16)


def _dequant_rows(q):
    return (q.astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(-1.0 / QSCALE))


def _m_row(slot):
    return slot * 3


def _x_row(slot):
    return slot * 3 + 1


def _y_row(slot):
    return slot * 3 + 2


def _block_max(m, PP: int):
    """Max of a (1, S) per-lane scalar over each read's PP-lane block.

    P>1 path-lanes of one read must share the per-diagonal rescale
    offset, or cross-path legality reduces would mix frames."""
    if PP == 1:
        return m
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1) % PP
    acc = m
    for delta in range(1, PP):
        up = jnp.where(lane >= delta,
                       pltpu.roll(m, shift=delta, axis=1), NEG)
        dn = jnp.where(lane < PP - delta,
                       pltpu.roll(m, shift=(-delta) % m.shape[1], axis=1),
                       NEG)
        acc = jnp.maximum(acc, jnp.maximum(up, dn))
    return acc


def _leg_reduce(src, legref, PP: int, WB: int, bwd: bool):
    """Cross-path logsumexp for the paths-in-lanes P>1 layout.

    Lane l = read * PP + path; the source (fwd: q = p - delta) / target
    (bwd: p = q + delta) path values sit delta lanes away, so each
    legality plane contributes one masked static lane-roll. Rolls that
    wrap into a neighboring read's lane block always correspond to a
    path index outside [0, P) and arrive NEG-masked by construction
    (tile_leg_windows)."""
    acc = None
    for j in range(2 * PP - 1):
        delta = j - (PP - 1)
        m = legref[0, 0, j, 0:WB, :]
        shift = (-delta if bwd else delta) % src.shape[1]
        cand = src if shift == 0 else pltpu.roll(src, shift=shift, axis=1)
        cand = cand + m
        acc = cand if acc is None else jnp.logaddexp(acc, cand)
    return acc


def _pack16_log(problem: bfb.BandedProblem) -> np.ndarray:
    out = np.zeros(16, dtype=np.float32)
    out[0:9] = problem.log_trans
    out[9:12] = problem.start_logs
    out[12:15] = problem.end_logs
    out[15] = bfb.LOG_GAPX_EMISSION
    return out


def _pack16(problem: bfb.BandedProblem) -> np.ndarray:
    # probability-space constants for the kernels (exp of the log params;
    # impossible transitions become exact 0)
    out = np.full(16, NEG, dtype=np.float64)
    out[0:9] = problem.log_trans
    out[9:12] = problem.start_logs
    out[12:15] = problem.end_logs
    out[15] = bfb.LOG_GAPX_EMISSION
    with np.errstate(over="ignore"):
        return np.exp(out).astype(np.float32)


def _fwd_kernel(geom_ref, refwin_ref, evinit_ref, evins_ref, pack_ref,
                lseflag_ref, hbm_f_ref, out_incr_ref, out_lse_ref,
                ring, evw, mprev, obuf, osem,
                *, T: int, WB: int, S: int, RB: int):
    """Forward sweep tile for one read group — PROBABILITY-space DP.

    The per-diagonal max-rescaling keeps the state bounded, so the
    recurrence runs on rescaled probabilities (multiply-adds on the VPU)
    instead of log values: transitions/start/end arrive as probabilities
    in ``pack``, the emission log-constant planes (c_m, c_y) arrive
    exponentiated, impossible states are exact 0.0, and the per-diagonal
    offset trace (out_incr) is log(max). Only the two Gaussian emission
    exps and the u16-log stack quantization remain transcendental per
    step — the log-space formulation spent ~12 transcendental (WB, S)
    passes per diagonal on logaddexp chains and was VPU-transcendental
    bound.

    ring: (RING_ROWS, SUBPAD + WB + RB, S); data at [SUBPAD, SUBPAD+WB);
    forward re-base reads at +128k so the extra RB pad sits on the right.
    evw: (NEV, SUBPAD + WB, S); data at [SUBPAD, SUBPAD+WB).
    obuf: (2, WB, S) DMA staging; osem: 2 DMA semaphores.
    """
    g = pl.program_id(0)
    t = pl.program_id(1)
    base = SUBPAD

    tr = lambda i: pack_ref[0, pl.ds(i, 1), :]
    t_mm = tr(T_MM); t_mx = tr(T_MX); t_my = tr(T_MY)
    t_xm = tr(T_XM); t_xx = tr(T_XX); t_ym = tr(T_YM); t_yy = tr(T_YY)
    start_m = tr(9); start_x = tr(10); start_y = tr(11)
    end_m = tr(12); end_x = tr(13); end_y = tr(14)
    gapx_e = tr(15)

    sub = jax.lax.broadcasted_iota(jnp.int32, (WB, S), 0)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.zeros(ring.shape, dtype=ring.dtype)
        mprev[...] = jnp.zeros(mprev.shape, mprev.dtype)

    @pl.when(t > 0)
    def _do_rebase():
        dkv = geom_ref[0, 0, G_DK, pl.ds(0, 1), :]   # (1, S)
        for r in range(RING_ROWS):
            row = ring[r]
            out = row[base:base + WB, :]
            for k in range(1, RB // 128 + 1):
                out = jnp.where(dkv == k, row[base + 128 * k:
                                              base + 128 * k + WB, :], out)
            ring[r, base:base + WB, :] = out

    evw[0, base:base + WB, :] = evinit_ref[0, 0, 0]
    evw[1, base:base + WB, :] = evinit_ref[0, 0, 1]
    evw[2, base:base + WB, :] = evinit_ref[0, 0, 2]

    m_hat = refwin_ref[0, 0, 0, 0:WB, :]
    inv_m = refwin_ref[0, 0, 1, 0:WB, :]
    cp_m = refwin_ref[0, 0, 2, 0:WB, :]    # exp(c_m) (aligner pre-exps)
    inv_y = refwin_ref[0, 0, 3, 0:WB, :]
    cp_y = refwin_ref[0, 0, 4, 0:WB, :]    # exp(c_y)
    kvalid = inv_m > 0.0
    e_gapx = jnp.where(kvalid, gapx_e, 0.0)

    lse_on = lseflag_ref[0, 0, 0, 0] == 1

    def out_dma(slot, d):
        return pltpu.make_async_copy(obuf.at[slot], hbm_f_ref.at[g, d],
                                     osem.at[slot])

    def body(i, r_prev, slot, slot1, slot2):
        d = t * T + i

        xoff = geom_ref[0, 0, G_XOFF, pl.ds(i, 1), :]
        wd = geom_ref[0, 0, G_WIDTH, pl.ds(i, 1), :]

        @pl.when(i > 0)
        def _advance():
            mean_s = evins_ref[0, 0, 0, pl.ds(i, 1), :]
            val_s = evins_ref[0, 0, 1, pl.ds(i, 1), :]
            cb_s = evins_ref[0, 0, 2, pl.ds(i, 1), :]
            sh_mean = evw[0, base - 1:base - 1 + WB, :]
            sh_val = evw[1, base - 1:base - 1 + WB, :]
            sh_cb = evw[2, base - 1:base - 1 + WB, :]
            is0 = sub == 0
            evw[0, base:base + WB, :] = jnp.where(is0, mean_s, sh_mean)
            evw[1, base:base + WB, :] = jnp.where(is0, val_s, sh_val)
            evw[2, base:base + WB, :] = jnp.where(is0, cb_s, sh_cb)

        ev_mean = evw[0, base:base + WB, :]
        ev_ok = evw[1, base:base + WB, :] > 0.5
        cw = evw[2, base:base + WB, :]   # per-event best-case log-emission
        ok = kvalid & ev_ok
        am = (ev_mean - m_hat) * inv_m
        ay = (ev_mean - m_hat) * inv_y
        # event-normalized emissions: subtracting the per-event best-case
        # log-emission inside the exponent bounds the within-diagonal
        # dynamic range (a gross outlier event costs EVERY consuming path
        # the same amount; the constant cancels in posteriors and is
        # added back to the totals on host)
        e_match = jnp.where(ok, cp_m, 0.0) * jnp.exp(-(0.5 * am * am + cw))
        e_stay = jnp.where(ok, cp_y, 0.0) * jnp.exp(-(0.5 * ay * ay + cw))

        inband = jnp.logical_and(sub >= xoff, sub < xoff + wd)

        p1_m_lo = ring[_m_row(slot1), base - 1:base - 1 + WB, :]
        p1_x_lo = ring[_x_row(slot1), base - 1:base - 1 + WB, :]
        p1_m_up = ring[_m_row(slot1), base:base + WB, :]
        p1_y_up = ring[_y_row(slot1), base:base + WB, :]
        p2_m = ring[_m_row(slot2), base - 1:base - 1 + WB, :]
        p2_x = ring[_x_row(slot2), base - 1:base - 1 + WB, :]
        p2_y = ring[_y_row(slot2), base - 1:base - 1 + WB, :]

        # Max-frame leapfrog: the step is computed in the frame of
        # B = max(FRAME(d-1), FRAME(d-2)), so BOTH neighbor diagonals
        # are only ever DAMPED into it — w1 = FRAME(d-1)/B on the d-1
        # gap terms, w2 = FRAME(d-2)/B on the d-2 match terms, both
        # exp(<=0): nothing can overflow and no clipping is needed (a
        # clipped one-sided d-2-frame scheme lost real mass whenever a
        # band-turn drop was followed by recovery — the leapfrog ratio
        # swings to large POSITIVE values there). A damp factor that
        # underflows to 0 kills mass >~88 nats below the live frame —
        # dead by construction. r_prev carries the log frame ratio
        # lr = log(FRAME(d-1)/FRAME(d-2)) as a (1, S) scalar.
        lr = r_prev
        w1 = jnp.exp(jnp.minimum(lr, 0.0))
        w2 = jnp.exp(-jnp.maximum(lr, 0.0))
        t_mx_w = t_mx * w1
        t_xx_w = t_xx * w1
        t_my_w = t_my * w1
        t_yy_w = t_yy * w1
        gx = (p1_m_lo * t_mx_w + p1_x_lo * t_xx_w) * e_gapx
        mm = ((p2_m * t_mm + p2_x * t_xm + p2_y * t_ym) * w2) * e_match
        gy = (p1_m_up * t_my_w + p1_y_up * t_yy_w) * e_stay

        is_init = d == 0
        cell0 = sub == 0
        mm = jnp.where(is_init, jnp.where(cell0, start_m * SCALE, 0.0),
                       jnp.where(inband, mm, 0.0))
        gx = jnp.where(is_init, jnp.where(cell0, start_x * SCALE, 0.0),
                       jnp.where(inband, gx, 0.0))
        gy = jnp.where(is_init, jnp.where(cell0, start_y * SCALE, 0.0),
                       jnp.where(inband, gy, 0.0))

        mx = jnp.maximum(jnp.max(mm, axis=0, keepdims=True),
                         jnp.maximum(jnp.max(gx, axis=0, keepdims=True),
                                     jnp.max(gy, axis=0, keepdims=True)))
        m = jnp.where(mx > 0.0, mx, SCALE)
        # rescale via 1/m then *SCALE: the combined SCALE/m overflows f32
        # when m is tiny (a near-dead diagonal)
        sc1 = 1.0 / m
        mm = (mm * sc1) * SCALE
        gx = (gx * sc1) * SCALE
        gy = (gy * sc1) * SCALE

        ring[_m_row(slot), base:base + WB, :] = mm
        ring[_x_row(slot), base:base + WB, :] = gx
        ring[_y_row(slot), base:base + WB, :] = gy

        buf = i % 2

        @pl.when(i > 1)
        def _wait_reuse():
            out_dma(buf, d - 2).wait()

        obuf[buf] = jnp.log(mm) - LOG_SCALE   # f32 log-rel row
        out_dma(buf, d).start()

        # the end-weighted logsumexp is consumed only at each lane's
        # final diagonal; skip whole tiles that contain none
        @pl.when(lse_on)
        def _lse():
            lse = jnp.log(jnp.sum(mm * end_m, axis=0, keepdims=True)
                          + jnp.sum(gx * end_x, axis=0, keepdims=True)
                          + jnp.sum(gy * end_y, axis=0, keepdims=True)) \
                - LOG_SCALE
            out_lse_ref[0, pl.ds(i, 1), :] = lse
        # FRAME(d) = B * m/SCALE  =>  lr(d) = log(FRAME(d)/FRAME(d-1))
        #   = log(B/FRAME(d-1)) + log m - log SCALE, and log(B/F(d-1))
        #   = max(0, -lr); the incr trace stays the per-diagonal frame
        #   increment (prefix sum = log FRAME(d)), same contract as the
        #   log-space kernels.
        lr_new = jnp.maximum(-lr, 0.0) + (jnp.log(m) - LOG_SCALE)
        out_incr_ref[0, pl.ds(i, 1), :] = lr_new
        return lr_new

    def step3(j, m_prev):
        i = j * 3
        m = body(i, m_prev, 0, 2, 1)
        m = body(i + 1, m, 1, 0, 2)
        m = body(i + 2, m, 2, 1, 0)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev[0:1, :])
    mprev[0:1, :] = m_final
    out_dma(0, t * T + T - 2).wait()
    out_dma(1, t * T + T - 1).wait()


def _bwd_m(slot):
    return slot % 3


def _bwd_x(slot):
    return 3 + (slot % 2)


def _bwd_y(slot):
    return 5 + (slot % 2)


def _bwd_kernel(geom_ref, refwin_ref, evinit_ref, evins_ref, pack_ref,
                hbm_fin_ref, hbm_post_ref, out_incr_ref, out_lse_ref,
                out_fmax_ref, ring, evw, mprev, obuf, osem, ibuf, isem,
                *, T: int, WB: int, S: int, RB: int, Dpad: int,
                fuse_post: bool):
    """Backward sweep tile (descending diagonals); optionally fuses the
    forward match rows (DMA-prefetched from hbm_fin_ref) into an
    unnormalized log-posterior output.

    ring data sits at [SUBPAD + RB, ...): backward re-base reads at -128k.
    """
    g = pl.program_id(0)
    t = pl.program_id(1)
    base = SUBPAD + RB
    d_start = Dpad - t * T

    tr = lambda i: pack_ref[0, pl.ds(i, 1), :]
    t_mm = tr(T_MM); t_mx = tr(T_MX); t_my = tr(T_MY)
    t_xm = tr(T_XM); t_xx = tr(T_XX); t_ym = tr(T_YM); t_yy = tr(T_YY)
    start_m = tr(9); start_x = tr(10); start_y = tr(11)
    end_m = tr(12); end_x = tr(13); end_y = tr(14)
    gapx_e = tr(15)

    sub = jax.lax.broadcasted_iota(jnp.int32, (WB, S), 0)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.zeros(ring.shape, dtype=ring.dtype)
        mprev[...] = jnp.zeros(mprev.shape, mprev.dtype)

    @pl.when(t > 0)
    def _do_rebase():
        dkv = geom_ref[0, 0, G_DKB, pl.ds(T - 1, 1), :]   # row of d_start
        for r in range(7):
            row = ring[r]
            out = row[base:base + WB, :]
            for k in range(1, RB // 128 + 1):
                out = jnp.where(dkv == k, row[base - 128 * k:
                                              base - 128 * k + WB, :], out)
            ring[r, base:base + WB, :] = out

    evw[0, SUBPAD:SUBPAD + WB, :] = evinit_ref[0, 0, 0]
    evw[1, SUBPAD:SUBPAD + WB, :] = evinit_ref[0, 0, 1]
    evw[2, SUBPAD:SUBPAD + WB, :] = evinit_ref[0, 0, 2]

    m_hat = refwin_ref[0, 0, 0]
    inv_m = refwin_ref[0, 0, 1]
    cp_m = refwin_ref[0, 0, 2]     # exp(c_m) (aligner pre-exps)
    inv_y = refwin_ref[0, 0, 3]
    cp_y = refwin_ref[0, 0, 4]     # exp(c_y)
    # x+1 rows: static +1 sublane shift of the (WB+8, S) window
    m_hat1 = m_hat[1:1 + WB, :]
    inv_m1 = inv_m[1:1 + WB, :]
    cp_m1 = cp_m[1:1 + WB, :]
    m_hat0 = m_hat[0:WB, :]
    inv_m0 = inv_m[0:WB, :]
    inv_y0 = inv_y[0:WB, :]
    cp_y0 = cp_y[0:WB, :]
    gapx_ok = jnp.where(inv_m1 > 0.0, gapx_e, 0.0)

    def out_dma(slot, d):
        return pltpu.make_async_copy(obuf.at[slot], hbm_post_ref.at[g, d],
                                     osem.at[slot])

    def in_dma(slot, d):
        return pltpu.make_async_copy(hbm_fin_ref.at[g, d], ibuf.at[slot],
                                     isem.at[slot])

    if fuse_post:
        @pl.when(t == 0)
        def _prefetch0():
            in_dma(0, d_start).start()

    def body(i, r_prev, slot, slot1, slot2):
        d = d_start - i
        row = T - 1 - i
        xoff = geom_ref[0, 0, G_XOFF, pl.ds(row, 1), :]
        wd = geom_ref[0, 0, G_WIDTH, pl.ds(row, 1), :]
        is_end = geom_ref[0, 0, G_ISEND, pl.ds(row, 1), :] == 1

        @pl.when(i > 0)
        def _advance():
            mean_s = evins_ref[0, 0, 0, pl.ds(i, 1), :]
            val_s = evins_ref[0, 0, 1, pl.ds(i, 1), :]
            cb_s = evins_ref[0, 0, 2, pl.ds(i, 1), :]
            sh_mean = evw[0, SUBPAD + 1:SUBPAD + 1 + WB, :]
            sh_val = evw[1, SUBPAD + 1:SUBPAD + 1 + WB, :]
            sh_cb = evw[2, SUBPAD + 1:SUBPAD + 1 + WB, :]
            isR = sub == WB - 1
            evw[0, SUBPAD:SUBPAD + WB, :] = jnp.where(isR, mean_s, sh_mean)
            evw[1, SUBPAD:SUBPAD + WB, :] = jnp.where(isR, val_s, sh_val)
            evw[2, SUBPAD:SUBPAD + WB, :] = jnp.where(isR, cb_s, sh_cb)

        ev_mean = evw[0, SUBPAD:SUBPAD + WB, :]
        ev_ok = evw[1, SUBPAD:SUBPAD + WB, :] > 0.5
        cw = evw[2, SUBPAD:SUBPAD + WB, :]

        ok1 = (inv_m1 > 0.0) & ev_ok
        am1 = (ev_mean - m_hat1) * inv_m1
        e_match_to = jnp.where(ok1, cp_m1, 0.0) \
            * jnp.exp(-(0.5 * am1 * am1 + cw))
        ok0 = (inv_m0 > 0.0) & ev_ok
        ay0 = (ev_mean - m_hat0) * inv_y0
        e_stay_same = jnp.where(ok0, cp_y0, 0.0) \
            * jnp.exp(-(0.5 * ay0 * ay0 + cw))

        b1_y = ring[_bwd_y(slot1), base:base + WB, :]
        b1_x = ring[_bwd_x(slot1), base + 1:base + 1 + WB, :]
        b2_m = ring[_bwd_m(slot2), base + 1:base + 1 + WB, :]

        # max-frame leapfrog (see the forward kernel): compute in the
        # frame of max(FRAME(d+1), FRAME(d+2)) — both neighbors damped,
        # w1/w2 = exp(<=0), no clipping
        lr = r_prev
        w1 = jnp.exp(jnp.minimum(lr, 0.0))
        w2 = jnp.exp(-jnp.maximum(lr, 0.0))
        gx_red = (b1_x * w1) * gapx_ok
        mm_red = (b2_m * w2) * e_match_to
        gy_term = (b1_y * w1) * e_stay_same

        b_match = gx_red * t_mx + mm_red * t_mm + gy_term * t_my
        b_gapx = gx_red * t_xx + mm_red * t_xm
        b_gapy = mm_red * t_ym + gy_term * t_yy

        inband = jnp.logical_and(sub >= xoff, sub < xoff + wd)
        bm = jnp.where(inband, jnp.where(is_end, end_m * SCALE, b_match),
                       0.0)
        bx = jnp.where(inband, jnp.where(is_end, end_x * SCALE, b_gapx),
                       0.0)
        by = jnp.where(inband, jnp.where(is_end, end_y * SCALE, b_gapy),
                       0.0)

        mx = jnp.maximum(jnp.max(bm, axis=0, keepdims=True),
                         jnp.maximum(jnp.max(bx, axis=0, keepdims=True),
                                     jnp.max(by, axis=0, keepdims=True)))
        m = jnp.where(is_end, SCALE, jnp.where(mx > 0.0, mx, SCALE))
        sc1 = 1.0 / m
        bm = (bm * sc1) * SCALE
        bx = (bx * sc1) * SCALE
        by = (by * sc1) * SCALE

        ring[_bwd_m(slot), base:base + WB, :] = bm
        ring[_bwd_x(slot), base:base + WB, :] = bx
        ring[_bwd_y(slot), base:base + WB, :] = by

        buf = i % 2
        lbm = jnp.log(bm) - LOG_SCALE
        if fuse_post:
            # wait for this diagonal's forward row; prefetch the next
            in_dma(buf, d).wait()

            @pl.when(d - 1 >= 0)
            def _prefetch_next():
                in_dma(1 - buf, d - 1).start()
            fused = lbm + ibuf[buf]
        else:
            fused = lbm
        # re-center the u16 quantization on the fused-row max so the
        # window always covers the survivors (>= threshold cells sit
        # within ~5 nats of it); the max is emitted for the compaction
        # normalizer
        m2raw = jnp.max(fused, axis=0, keepdims=True)
        m2 = jnp.where(m2raw > NEG * 0.5, m2raw, 0.0)

        @pl.when(i > 1)
        def _wait_reuse():
            out_dma(buf, d + 2).wait()

        obuf[buf] = _quant_rows(fused - m2)
        out_dma(buf, d).start()
        out_fmax_ref[0, pl.ds(row, 1), :] = m2

        # the start-weighted logsumexp is consumed only at diagonal 0
        @pl.when(d == 0)
        def _lse():
            lse = jnp.log(jnp.sum(bm * start_m, axis=0, keepdims=True)
                          + jnp.sum(bx * start_x, axis=0, keepdims=True)
                          + jnp.sum(by * start_y, axis=0, keepdims=True)) \
                - LOG_SCALE
            out_lse_ref[0, pl.ds(row, 1), :] = lse
        lr_new = jnp.maximum(-lr, 0.0) + (jnp.log(m) - LOG_SCALE)
        out_incr_ref[0, pl.ds(row, 1), :] = lr_new
        return lr_new

    # d = d_start - i, d_start % 3 == 2 (Dp1p % 3 == 0): static slots
    def step3(j, m_prev):
        i = j * 3
        m = body(i, m_prev, 2, 0, 1)
        m = body(i + 1, m, 1, 2, 0)
        m = body(i + 2, m, 0, 1, 2)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev[0:1, :])
    mprev[0:1, :] = m_final
    out_dma(0, d_start - T + 2).wait()
    out_dma(1, d_start - T + 1).wait()


def _fwd_kernel_log(geom_ref, refwin_ref, evinit_ref, evins_ref,
                pack_ref, lseflag_ref, *rest,
                T: int, WB: int, S: int, RB: int, PP: int = 1,
                estream: bool = False, expect: bool = False):
    """Forward sweep tile — LOG-space DP (unbounded dynamic range).

    Selected as the production default: exact for unbounded within-band
    dynamic range at ~1.4x the probability-space sweep time (the DP is
    latency/pass bound, not transcendental bound). PP > 1 selects the
    paths-in-lanes degenerate-base expansion (lane = read * PP + path)
    with masked lane-roll legality reduces and block-shared rescales.

    ring: (RING_ROWS, SUBPAD + WB + RB, S); data at [SUBPAD, SUBPAD+WB);
    forward re-base reads at +128k so the extra RB pad sits on the right.
    evw: (NEV, SUBPAD + WB, S); data at [SUBPAD, SUBPAD+WB).
    obuf: (2, WB, S) DMA staging; osem: 2 DMA semaphores.
    """
    if PP > 1:
        legf_ref = rest[0]
        rest = rest[1:]
    if estream:
        hbm_e_ref = rest[0]
        rest = rest[1:]
        (hbm_f_ref, out_incr_ref, out_lse_ref,
         ring, evw, mprev, obuf, osem, ebuf, esem) = rest
    else:
        (hbm_f_ref, out_incr_ref, out_lse_ref,
         ring, evw, mprev, obuf, osem) = rest
    g = pl.program_id(0)
    t = pl.program_id(1)
    base = SUBPAD

    tr = lambda i: pack_ref[0, pl.ds(i, 1), :]
    t_mm = tr(T_MM); t_mx = tr(T_MX); t_my = tr(T_MY)
    t_xm = tr(T_XM); t_xx = tr(T_XX); t_ym = tr(T_YM); t_yy = tr(T_YY)
    start_m = tr(9); start_x = tr(10); start_y = tr(11)
    end_m = tr(12); end_x = tr(13); end_y = tr(14)
    gapx_e = tr(15)

    sub = jax.lax.broadcasted_iota(jnp.int32, (WB, S), 0)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev[...] = jnp.zeros(mprev.shape, mprev.dtype)

    @pl.when(t > 0)
    def _do_rebase():
        dkv = geom_ref[0, 0, G_DK, pl.ds(0, 1), :]   # (1, S)
        for r in range(RING_ROWS):
            row = ring[r]
            out = row[base:base + WB, :]
            for k in range(1, RB // 128 + 1):
                out = jnp.where(dkv == k, row[base + 128 * k:
                                              base + 128 * k + WB, :], out)
            ring[r, base:base + WB, :] = out

    if not estream:
        evw[0, base:base + WB, :] = evinit_ref[0, 0, 0]
        evw[1, base:base + WB, :] = evinit_ref[0, 0, 1]

    m_hat = refwin_ref[0, 0, 0, 0:WB, :]
    inv_m = refwin_ref[0, 0, 1, 0:WB, :]
    c_m = refwin_ref[0, 0, 2, 0:WB, :]
    inv_y = refwin_ref[0, 0, 3, 0:WB, :]
    c_y = refwin_ref[0, 0, 4, 0:WB, :]
    kvalid = inv_m > 0.0
    e_gapx = jnp.where(kvalid, gapx_e, NEG)

    lse_on = lseflag_ref[0, 0, 0, 0] == 1

    def out_dma(slot, d):
        return pltpu.make_async_copy(obuf.at[slot], hbm_f_ref.at[g, d],
                                     osem.at[slot])

    if estream:
        def e_dma(slot, d):
            return pltpu.make_async_copy(hbm_e_ref.at[g, d], ebuf.at[slot],
                                         esem.at[slot])

        e_dma(0, t * T).start()

    def body(i, m_prev, slot, slot1, slot2):
        d = t * T + i

        xoff = geom_ref[0, 0, G_XOFF, pl.ds(i, 1), :]
        wd = geom_ref[0, 0, G_WIDTH, pl.ds(i, 1), :]

        if estream:
            # precomputed emission row for this diagonal (HDP spline &
            # friends: stay emission == match emission); double-buffered
            # DMA, validity/event masking baked in upstream
            @pl.when(i + 1 < T)
            def _e_prefetch():
                e_dma((i + 1) % 2, d + 1).start()
            e_dma(i % 2, d).wait()
            e_match = ebuf[i % 2, 0:WB, :]
            e_stay = e_match
        else:
            @pl.when(i > 0)
            def _advance():
                mean_s = evins_ref[0, 0, 0, pl.ds(i, 1), :]
                val_s = evins_ref[0, 0, 1, pl.ds(i, 1), :]
                sh_mean = evw[0, base - 1:base - 1 + WB, :]
                sh_val = evw[1, base - 1:base - 1 + WB, :]
                is0 = sub == 0
                evw[0, base:base + WB, :] = jnp.where(is0, mean_s, sh_mean)
                evw[1, base:base + WB, :] = jnp.where(is0, val_s, sh_val)

            ev_mean = evw[0, base:base + WB, :]
            ev_ok = evw[1, base:base + WB, :] > 0.5
            ok = kvalid & ev_ok
            am = (ev_mean - m_hat) * inv_m
            ay = (ev_mean - m_hat) * inv_y
            e_match = jnp.where(ok, c_m - 0.5 * am * am, NEG)
            e_stay = jnp.where(ok, c_y - 0.5 * ay * ay, NEG)

        inband = jnp.logical_and(sub >= xoff, sub < xoff + wd)

        p1_m_lo = ring[_m_row(slot1), base - 1:base - 1 + WB, :]
        p1_x_lo = ring[_x_row(slot1), base - 1:base - 1 + WB, :]
        p1_m_up = ring[_m_row(slot1), base:base + WB, :]
        p1_y_up = ring[_y_row(slot1), base:base + WB, :]
        p2_m = ring[_m_row(slot2), base - 1:base - 1 + WB, :]
        p2_x = ring[_x_row(slot2), base - 1:base - 1 + WB, :]
        p2_y = ring[_y_row(slot2), base - 1:base - 1 + WB, :]

        src_x = jnp.logaddexp(p1_m_lo + t_mx, p1_x_lo + t_xx)
        src_m = jnp.logaddexp(jnp.logaddexp(p2_m + t_mm, p2_x + t_xm),
                              p2_y + t_ym)
        if PP > 1:
            # gapX / match gather across source paths with legality;
            # gapY stays on the same path
            src_x = _leg_reduce(src_x, legf_ref, PP, WB, bwd=False)
            src_m = _leg_reduce(src_m, legf_ref, PP, WB, bwd=False)
        gx = src_x + e_gapx
        mm = (src_m - m_prev) + e_match
        gy = jnp.logaddexp(p1_m_up + t_my, p1_y_up + t_yy) + e_stay

        # per-(diagonal, lane) start injection: geometry marks each
        # segment's first diagonal (several per lane when segments are
        # lane-packed, ops/packing.py); the start cell is the band's
        # single in-band cell there (sub == xoff; xoff == 0 at d == 0)
        is_start = geom_ref[0, 0, G_ISSTART, pl.ds(i, 1), :] == 1
        cell0 = sub == xoff
        mm = jnp.where(is_start, jnp.where(cell0, start_m, NEG),
                       jnp.where(inband, mm, NEG))
        gx = jnp.where(is_start, jnp.where(cell0, start_x, NEG),
                       jnp.where(inband, gx, NEG))
        gy = jnp.where(is_start, jnp.where(cell0, start_y, NEG),
                       jnp.where(inband, gy, NEG))

        mx = jnp.maximum(jnp.max(mm, axis=0, keepdims=True),
                         jnp.maximum(jnp.max(gx, axis=0, keepdims=True),
                                     jnp.max(gy, axis=0, keepdims=True)))
        mx = _block_max(mx, PP)   # shared frame across a read's path-lanes
        m = jnp.where(mx > NEG * 0.5, mx, 0.0)
        mm = jnp.maximum(mm - m, NEG)
        gx = jnp.maximum(gx - m, NEG)
        gy = jnp.maximum(gy - m, NEG)

        ring[_m_row(slot), base:base + WB, :] = mm
        ring[_x_row(slot), base:base + WB, :] = gx
        ring[_y_row(slot), base:base + WB, :] = gy

        buf = i % 2

        @pl.when(i > 1)
        def _wait_reuse():
            out_dma(buf, d - 2).wait()

        if expect:
            # expectation runs stream all three states (the backward
            # pass needs f_m/f_x/f_y of the FROM diagonal)
            obuf[buf, 0] = mm
            obuf[buf, 1] = gx
            obuf[buf, 2] = gy
        else:
            obuf[buf] = mm                     # f32 log-rel row
        out_dma(buf, d).start()

        # end-weighted logsumexp: consumed only at each lane's final
        # diagonal -> skipped for tiles containing none (3 exp passes)
        @pl.when(lse_on)
        def _lse():
            lse = jnp.log(
                jnp.sum(jnp.exp(mm + end_m), axis=0, keepdims=True)
                + jnp.sum(jnp.exp(gx + end_x), axis=0, keepdims=True)
                + jnp.sum(jnp.exp(gy + end_y), axis=0, keepdims=True))
            out_lse_ref[0, pl.ds(i, 1), :] = lse
        out_incr_ref[0, pl.ds(i, 1), :] = m
        return m

    def step3(j, m_prev):
        i = j * 3
        m = body(i, m_prev, 0, 2, 1)
        m = body(i + 1, m, 1, 0, 2)
        m = body(i + 2, m, 2, 1, 0)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev[0:1, :])
    mprev[0:1, :] = m_final
    out_dma(0, t * T + T - 2).wait()
    out_dma(1, t * T + T - 1).wait()


def _bwd_kernel_log(geom_ref, refwin_ref, evinit_ref, evins_ref,
                pack_ref, *rest,
                T: int, WB: int, S: int, RB: int, Dpad: int,
                fuse_post: bool, PP: int = 1, estream: bool = False,
                expect: bool = False, fuse_compact: bool = False,
                rslot: int = 5, log_thr: float = float(np.log(0.01))):
    """Backward sweep tile (descending diagonals); optionally fuses the
    forward match rows (DMA-prefetched from hbm_fin_ref) into an
    unnormalized log-posterior output.

    ``fuse_compact`` moves survivor extraction INTO this sweep: the
    fused row is normalized in-register (the expectation path's
    Fo(d)-total stream + a compensated running backward offset),
    thresholded, and rank-compacted to ``rslot`` slots per diagonal —
    the u16 posterior stack is never written OR re-read (it was ~22%
    of single-chip compute plus 4 B/cell of stack DMA, round-4
    profile). Only the tiny slot/count outputs leave the kernel; the
    global prefix-pack (_compact_from_slots) stays XLA.

    ring data sits at [SUBPAD + RB, ...): backward re-base reads at -128k.
    PP > 1: paths-in-lanes legality reduces (see the forward kernel).
    """
    if PP > 1:
        legb_ref = rest[0]
        rest = rest[1:]
    gauss_exp = expect and not estream   # Gaussian kexp moments apply
    # input order: [ebnd][cvecf][ivar] fin [estack]; outputs:
    # post incr lse fmax [texp][kexp][slots cnt]; then scratch
    if estream:
        ebnd_ref = rest[0]
        rest = rest[1:]
    if expect or fuse_compact:
        # HDP EM: transition expectations only (emissions train via the
        # Gibbs sampler on thresholded assignments; there is no Gaussian
        # moment accumulator — banded_fb._expectations_core num_kmers=0)
        cvecf_ref = rest[0]
        rest = rest[1:]
    if gauss_exp:
        ivar_ref = rest[0]
        rest = rest[1:]
    hbm_fin_ref = rest[0]
    rest = rest[1:]
    if estream:
        hbm_e_ref = rest[0]
        rest = rest[1:]
    (hbm_post_ref, out_incr_ref, out_lse_ref, out_fmax_ref) = rest[0:4]
    rest = rest[4:]
    if expect:
        out_texp_ref = rest[0]
        rest = rest[1:]
    if gauss_exp:
        out_kexp_ref = rest[0]
        rest = rest[1:]
    if fuse_compact:
        out_slots_ref, out_cnt_ref = rest[0:2]
        rest = rest[2:]
    (ring, evw, mprev, obuf, osem, ibuf, isem) = rest[0:7]
    if estream:
        ering, esem3 = rest[7:9]
    g = pl.program_id(0)
    t = pl.program_id(1)
    base = SUBPAD + RB
    d_start = Dpad - t * T

    tr = lambda i: pack_ref[0, pl.ds(i, 1), :]
    t_mm = tr(T_MM); t_mx = tr(T_MX); t_my = tr(T_MY)
    t_xm = tr(T_XM); t_xx = tr(T_XX); t_ym = tr(T_YM); t_yy = tr(T_YY)
    start_m = tr(9); start_x = tr(10); start_y = tr(11)
    end_m = tr(12); end_x = tr(13); end_y = tr(14)
    gapx_e = tr(15)

    sub = jax.lax.broadcasted_iota(jnp.int32, (WB, S), 0)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev[...] = jnp.zeros(mprev.shape, mprev.dtype)

    if expect:
        @pl.when(t == 0)
        def _init_texp():
            out_texp_ref[...] = jnp.zeros(out_texp_ref.shape,
                                          out_texp_ref.dtype)
    if gauss_exp:
        out_kexp_ref[...] = jnp.zeros(out_kexp_ref.shape,
                                      out_kexp_ref.dtype)
    if fuse_compact:
        # the fmax output has no consumer on this path; blanket-write
        # the block (Mosaic requires every output written)
        out_fmax_ref[...] = jnp.zeros(out_fmax_ref.shape,
                                      out_fmax_ref.dtype)

    @pl.when(t > 0)
    def _do_rebase():
        dkv = geom_ref[0, 0, G_DKB, pl.ds(T - 1, 1), :]   # row of d_start
        for r in range(7):
            row = ring[r]
            out = row[base:base + WB, :]
            for k in range(1, RB // 128 + 1):
                out = jnp.where(dkv == k, row[base - 128 * k:
                                              base - 128 * k + WB, :], out)
            ring[r, base:base + WB, :] = out

    if not estream:
        evw[0, SUBPAD:SUBPAD + WB, :] = evinit_ref[0, 0, 0]
        evw[1, SUBPAD:SUBPAD + WB, :] = evinit_ref[0, 0, 1]

    m_hat = refwin_ref[0, 0, 0]
    inv_m = refwin_ref[0, 0, 1]
    c_m = refwin_ref[0, 0, 2]
    inv_y = refwin_ref[0, 0, 3]
    c_y = refwin_ref[0, 0, 4]
    # x+1 rows: static +1 sublane shift of the (WB+8, S) window
    m_hat1 = m_hat[1:1 + WB, :]
    inv_m1 = inv_m[1:1 + WB, :]
    c_m1 = c_m[1:1 + WB, :]
    m_hat0 = m_hat[0:WB, :]
    inv_m0 = inv_m[0:WB, :]
    inv_y0 = inv_y[0:WB, :]
    c_y0 = c_y[0:WB, :]
    gapx_ok = jnp.where(inv_m1 > 0.0, gapx_e, NEG)

    def out_dma(slot, d):
        return pltpu.make_async_copy(obuf.at[slot], hbm_post_ref.at[g, d],
                                     osem.at[slot])

    def in_dma(slot, d):
        return pltpu.make_async_copy(hbm_fin_ref.at[g, d], ibuf.at[slot],
                                     isem.at[slot])

    if estream:
        def e_dma(slot, d):
            return pltpu.make_async_copy(hbm_e_ref.at[g, d],
                                         ering.at[slot], esem3.at[slot])

        # the first two consumed rows (d_start+1, d_start+2) belong to
        # the neighboring tile's x-frame; they arrive pre-re-based
        ering[(d_start + 1) % 3] = ebnd_ref[0, 0, 0]
        ering[(d_start + 2) % 3] = ebnd_ref[0, 0, 1]

    if fuse_post:
        @pl.when(t == 0)
        def _prefetch0():
            in_dma(0, d_start).start()

    def body(i, m_prev, slot, slot1, slot2):
        d = d_start - i
        row = T - 1 - i
        xoff = geom_ref[0, 0, G_XOFF, pl.ds(row, 1), :]
        wd = geom_ref[0, 0, G_WIDTH, pl.ds(row, 1), :]
        is_end = geom_ref[0, 0, G_ISEND, pl.ds(row, 1), :] == 1

        if estream:
            # slots hold rows d+1 (stay into (x, y+1)) and d+2 (match
            # into (x+1, y+1), +1 sublane shift); DMA row d now (its
            # slot freed last step), first used next step
            @pl.when(i < T - 1)
            def _e_start():
                e_dma(d % 3, d).start()

            @pl.when(i > 0)
            def _e_wait():
                e_dma((d + 1) % 3, d + 1).wait()
            e_match_to = ering[(d + 2) % 3][1:1 + WB, :]
            e_stay_same = ering[(d + 1) % 3][0:WB, :]
        else:
            @pl.when(i > 0)
            def _advance():
                mean_s = evins_ref[0, 0, 0, pl.ds(i, 1), :]
                val_s = evins_ref[0, 0, 1, pl.ds(i, 1), :]
                sh_mean = evw[0, SUBPAD + 1:SUBPAD + 1 + WB, :]
                sh_val = evw[1, SUBPAD + 1:SUBPAD + 1 + WB, :]
                isR = sub == WB - 1
                evw[0, SUBPAD:SUBPAD + WB, :] = jnp.where(isR, mean_s,
                                                          sh_mean)
                evw[1, SUBPAD:SUBPAD + WB, :] = jnp.where(isR, val_s,
                                                          sh_val)

            ev_mean = evw[0, SUBPAD:SUBPAD + WB, :]
            ev_ok = evw[1, SUBPAD:SUBPAD + WB, :] > 0.5

            ok1 = (inv_m1 > 0.0) & ev_ok
            am1 = (ev_mean - m_hat1) * inv_m1
            e_match_to = jnp.where(ok1, c_m1 - 0.5 * am1 * am1, NEG)
            ok0 = (inv_m0 > 0.0) & ev_ok
            ay0 = (ev_mean - m_hat0) * inv_y0
            e_stay_same = jnp.where(ok0, c_y0 - 0.5 * ay0 * ay0, NEG)

        b1_y = ring[_bwd_y(slot1), base:base + WB, :]
        b1_x = ring[_bwd_x(slot1), base + 1:base + 1 + WB, :]
        b2_m = ring[_bwd_m(slot2), base + 1:base + 1 + WB, :]

        gx_red = b1_x + gapx_ok
        mm_red = (b2_m - m_prev) + e_match_to
        gy_term = b1_y + e_stay_same

        if expect:
            # transition + emission expectations for the transitions OUT
            # of diagonal d: every term is already at hand (f rows of d
            # via the fuse DMA, the to-cell b+emission reductions above,
            # and the absolute normalizer Fo(d) - total [input stream]
            # + Bo(d+1) [running rescale sum in mprev row 1]). Mirrors
            # banded_fb._expectations_core accumulated at the TO
            # diagonal; see continuousHmm.c:159-178.
            buf = i % 2
            in_dma(buf, d).wait()

            @pl.when(d - 1 >= 0)
            def _prefetch_next_e():
                in_dma(1 - buf, d - 1).start()
            f_m = ibuf[buf, 0]
            f_x = ibuf[buf, 1]
            f_y = ibuf[buf, 2]
            normA = cvecf_ref[0, 0, pl.ds(row, 1), :] \
                + (mprev[1:2, :] + mprev[2:3, :])
            p_mx = jnp.exp(f_m + t_mx + gx_red + normA)
            p_xx = jnp.exp(f_x + t_xx + gx_red + normA)
            p_mm = jnp.exp(f_m + t_mm + mm_red + normA)
            p_xm = jnp.exp(f_x + t_xm + mm_red + normA)
            p_ym = jnp.exp(f_y + t_ym + mm_red + normA)
            p_my = jnp.exp(f_m + t_my + gy_term + normA)
            p_yy = jnp.exp(f_y + t_yy + gy_term + normA)
            for r_, pv in enumerate((p_mx, p_xx, p_mm, p_xm, p_ym,
                                     p_my, p_yy)):
                out_texp_ref[0, r_:r_ + 1, :] = \
                    out_texp_ref[0, r_:r_ + 1, :] \
                    + jnp.sum(pv, axis=0, keepdims=True)
            if gauss_exp:
                # per-kmer emission moments at the TO match cell
                # (x+1, y+1): dx = (event_mean - m_hat)/var, accumulated
                # per sublane and segment-summed by the x+1 kmer window
                # downstream. HDP runs skip this: emissions train via
                # Gibbs on thresholded assignments (num_kmers=0 in the
                # XLA core), and ev_mean/ivar only exist Gaussian-side.
                mtp = p_mm + p_xm + p_ym
                dxv = (ev_mean - m_hat1) * ivar_ref[0, 0:1, :]
                dxv = jnp.where(inv_m1 > 0.0, dxv, 0.0)
                out_kexp_ref[0, 0, 0] = out_kexp_ref[0, 0, 0] + mtp
                out_kexp_ref[0, 0, 1] = out_kexp_ref[0, 0, 1] + mtp * dxv
                out_kexp_ref[0, 0, 2] = out_kexp_ref[0, 0, 2] \
                    + mtp * dxv * dxv

        if PP > 1:
            # the to-cell (x+1) terms carry per-target-path emissions;
            # reduce them onto source-path lanes with x+1 legality
            gx_red = _leg_reduce(gx_red, legb_ref, PP, WB, bwd=True)
            mm_red = _leg_reduce(mm_red, legb_ref, PP, WB, bwd=True)

        b_match = jnp.logaddexp(jnp.logaddexp(gx_red + t_mx, mm_red + t_mm),
                                gy_term + t_my)
        b_gapx = jnp.logaddexp(gx_red + t_xx, mm_red + t_xm)
        b_gapy = jnp.logaddexp(mm_red + t_ym, gy_term + t_yy)

        inband = jnp.logical_and(sub >= xoff, sub < xoff + wd)
        bm = jnp.where(inband, jnp.where(is_end, end_m, b_match), NEG)
        bx = jnp.where(inband, jnp.where(is_end, end_x, b_gapx), NEG)
        by = jnp.where(inband, jnp.where(is_end, end_y, b_gapy), NEG)

        mx = jnp.maximum(jnp.max(bm, axis=0, keepdims=True),
                         jnp.maximum(jnp.max(bx, axis=0, keepdims=True),
                                     jnp.max(by, axis=0, keepdims=True)))
        mx = _block_max(mx, PP)   # shared frame across a read's path-lanes
        m = jnp.where(is_end, 0.0, jnp.where(mx > NEG * 0.5, mx, 0.0))
        bm = jnp.maximum(bm - m, NEG)
        bx = jnp.maximum(bx - m, NEG)
        by = jnp.maximum(by - m, NEG)

        ring[_bwd_m(slot), base:base + WB, :] = bm
        ring[_bwd_x(slot), base:base + WB, :] = bx
        ring[_bwd_y(slot), base:base + WB, :] = by

        if expect or fuse_compact:
            # Bo(d+1) -> Bo(d) for the next (lower-d) step; compensated
            # (TwoSum) running sum - thousands of O(1) increments reach
            # ~1e4 where plain f32 accumulation would drift ~0.01 nats
            bo = mprev[1:2, :]
            s_ = bo + m
            v_ = s_ - bo
            mprev[2:3, :] = mprev[2:3, :] + ((bo - (s_ - v_))
                                             + (m - v_))
            mprev[1:2, :] = s_
            # lane packing: backward offsets telescope per segment, so
            # the running sum restarts at each per-lane end-injection
            # row (the expectation normalizer stream is built before
            # the backward offsets exist and cannot carry them)
            mprev[1:2, :] = jnp.where(is_end, 0.0, mprev[1:2, :])
            mprev[2:3, :] = jnp.where(is_end, 0.0, mprev[2:3, :])

        buf = i % 2
        if expect:
            fused = bm + ibuf[buf, 0]     # waited above; row 0 = match
        elif fuse_post:
            # wait for this diagonal's forward row; prefetch the next
            in_dma(buf, d).wait()

            @pl.when(d - 1 >= 0)
            def _prefetch_next():
                in_dma(1 - buf, d - 1).start()
            fused = bm + ibuf[buf]
        else:
            fused = bm
        if fuse_compact:
            # in-sweep survivor extraction: absolute log posterior =
            # fused + (Fo(d) - total) [cvecf stream] + Bo(d) [mprev,
            # updated above], thresholded on f32 (membership matches
            # the XLA extract), rank-compacted by iterative min over
            # key = band offset << 12 | quantized -log p
            norm = cvecf_ref[0, 0, pl.ds(row, 1), :] \
                + (mprev[1:2, :] + mprev[2:3, :])
            vabs = fused + norm
            valid = vabs >= jnp.float32(log_thr)
            qe = jnp.minimum(jnp.round(jnp.maximum(-vabs, 0.0)
                                       * jnp.float32(QSCALE)),
                             4095.0).astype(jnp.int32)
            IMAXc = jnp.int32(0x7FFFFFFF)
            key = jnp.where(valid, (sub << 12) | qe, IMAXc)
            out_cnt_ref[0, pl.ds(row, 1), :] = jnp.sum(
                valid.astype(jnp.int32), axis=0, keepdims=True)
            prevk = jnp.full((1, S), -1, jnp.int32)
            for r_ in range(rslot):
                cur = jnp.where(key > prevk, key, IMAXc)
                nxt = jnp.min(cur, axis=0, keepdims=True)
                out_slots_ref[0, r_, pl.ds(row, 1), :] = nxt
                prevk = nxt
        if not fuse_compact:
            # re-center the u16 quantization on the fused-row max (see
            # the probability-space kernel)
            m2raw = jnp.max(fused, axis=0, keepdims=True)
            m2 = jnp.where(m2raw > NEG * 0.5, m2raw, 0.0)

            @pl.when(i > 1)
            def _wait_reuse():
                out_dma(buf, d + 2).wait()

            obuf[buf] = _quant_rows(fused - m2)
            out_dma(buf, d).start()
            out_fmax_ref[0, pl.ds(row, 1), :] = m2

        # the start-weighted logsumexp is consumed only at segment-start
        # diagonals (diagonal 0, plus each packed segment's d0 — the
        # geometry marks them per lane); lanes without a start here get
        # a garbage row that the segment-aware totals scan never reads
        is_start = geom_ref[0, 0, G_ISSTART, pl.ds(row, 1), :] == 1

        @pl.when(jnp.any(is_start))
        def _lse():
            lse = jnp.log(
                jnp.sum(jnp.exp(bm + start_m), axis=0, keepdims=True)
                + jnp.sum(jnp.exp(bx + start_x), axis=0, keepdims=True)
                + jnp.sum(jnp.exp(by + start_y), axis=0, keepdims=True))
            out_lse_ref[0, pl.ds(row, 1), :] = lse
        out_incr_ref[0, pl.ds(row, 1), :] = m
        return m

    # d = d_start - i, d_start % 3 == 2 (Dp1p % 3 == 0): static slots
    def step3(j, m_prev):
        i = j * 3
        m = body(i, m_prev, 2, 0, 1)
        m = body(i + 1, m, 1, 2, 0)
        m = body(i + 2, m, 0, 1, 2)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev[0:1, :])
    mprev[0:1, :] = m_final
    if not fuse_compact:
        out_dma(0, d_start - T + 2).wait()
        out_dma(1, d_start - T + 1).wait()


def _specs(NT, T, WB, S, fwd: bool):
    if fwd:
        gmap = lambda g, t: (g, t, 0, 0, 0)
        emap = lambda g, t: (g, t, 0, 0, 0)
        omap = lambda g, t: (g, t, 0)
    else:
        gmap = lambda g, t: (g, NT - 1 - t, 0, 0, 0)
        emap = lambda g, t: (g, t, 0, 0, 0)
        omap = lambda g, t: (g, NT - 1 - t, 0)
    in_specs = [
        pl.BlockSpec((1, 1, NGEOM, T, S), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NREF, WB + 2, S),
                     (lambda g, t: (g, t, 0, 0, 0)) if fwd else
                     (lambda g, t: (g, NT - 1 - t, 0, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NEV, WB, S), emap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NEV, T, S), emap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 16, S), lambda g, t: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_small = [
        pl.BlockSpec((1, T, S), omap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, S), omap, memory_space=pltpu.VMEM),
    ]
    return in_specs, out_small


@functools.partial(jax.jit,
                   static_argnames=("WB", "T", "S", "RB", "interpret",
                                    "log_space", "PP", "estream",
                                    "expect"))
def pallas_forward_b(geom, refwin, evinit, evins, pack, lseflag, legf=None,
                     estack=None,
                     *, WB: int, T: int,
                     S: int, RB: int, interpret: bool = False,
                     log_space: bool = False, PP: int = 1,
                     estream: bool = False, expect: bool = False):
    G, NT, _, T_, S_ = geom.shape
    Dp1p = NT * T
    in_specs, out_small = _specs(NT, T, WB, S, fwd=True)
    # per-tile flag: 1 if any lane's final diagonal falls in this tile
    # Mosaic rejects (1, 1) blocks of a (G, NT) array (the last two block
    # dims must be (8, 128)-divisible or full): broadcast the flag to one
    # (8, 128) i32 tile per grid cell.
    in_specs = in_specs + [pl.BlockSpec((1, 1, 8, 128),
                                        lambda g, t: (g, t, 0, 0),
                                        memory_space=pltpu.VMEM)]
    lseflag_t = jnp.broadcast_to(lseflag[:, :, None, None],
                                 lseflag.shape + (8, 128))
    args = (geom, refwin, evinit, evins, pack, lseflag_t)
    if PP > 1:
        NLEG = 2 * PP - 1
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, NLEG, WB, S), lambda g, t: (g, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
        args = args + (legf,)
    if estream:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        args = args + (estack,)
    ring_h = SUBPAD + WB + RB + SUBPAD
    out_shapes = (
        # forward stack stays f32: real reads' posterior-relevant cells
        # dip up to ~800 nats below the diagonal ridge, far beyond any
        # fixed-point window (u16@1/512 clamped at -128 and silently
        # dropped ~12% of aligned pairs on bundled reads). Expectation
        # runs stream all three states.
        jax.ShapeDtypeStruct((G, Dp1p, 3, WB, S) if expect
                             else (G, Dp1p, WB, S), jnp.float32),
        jax.ShapeDtypeStruct((G, Dp1p, S), jnp.float32),
        jax.ShapeDtypeStruct((G, Dp1p, S), jnp.float32),
    )
    assert (PP == 1 and not estream and not expect) or log_space, \
        "P>1 / streams / expectations require the log-space kernels"
    assert not (expect and PP > 1)
    kern = _fwd_kernel_log if log_space else _fwd_kernel
    kw = {"PP": PP, "estream": estream, "expect": expect} \
        if log_space else {}
    scratch = [pltpu.VMEM((RING_ROWS, ring_h, S), jnp.float32),
               pltpu.VMEM((NEV, SUBPAD + WB + 2, S), jnp.float32),
               pltpu.VMEM((8, S), jnp.float32),
               pltpu.VMEM(((2, 3, WB, S) if expect else (2, WB, S)),
                          jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]
    if estream:
        scratch += [pltpu.VMEM((2, WB + 8, S), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    fstack, incr, lse = pl.pallas_call(
        functools.partial(kern, T=T, WB=WB, S=S, RB=RB, **kw),
        grid=(G, NT),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) + tuple(out_small),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return fstack, incr, lse


@functools.partial(jax.jit,
                   static_argnames=("WB", "T", "S", "RB", "fuse_post",
                                    "interpret", "log_space", "PP",
                                    "estream", "expect", "fuse_compact",
                                    "rslot", "log_thr"))
def pallas_backward_b(geom, refwin, evinit, evins, pack, fstack, legb=None,
                      estack=None, ebnd=None, cvecf=None, ivar=None,
                      *, WB: int, T: int, S: int, RB: int,
                      fuse_post: bool = True, interpret: bool = False,
                      log_space: bool = False, PP: int = 1,
                      estream: bool = False, expect: bool = False,
                      fuse_compact: bool = False, rslot: int = 5,
                      log_thr: float = float(np.log(0.01))):
    G, NT, _, T_, S_ = geom.shape
    Dp1p = NT * T
    Dpad = Dp1p - 1
    in_specs, out_small = _specs(NT, T, WB, S, fwd=False)
    args = (geom, refwin, evinit, evins, pack)
    if PP > 1:
        NLEG = 2 * PP - 1
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, NLEG, WB, S),
                         lambda g, t: (g, NT - 1 - t, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
        args = args + (legb,)
    if estream:
        # boundary emission rows are indexed by the BACKWARD program id
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, 2, WB + 8, S),
                         lambda g, t: (g, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
        args = args + (ebnd,)
    if expect or fuse_compact:
        # per-diagonal forward normalizer Fo(d) - total (fwd-tile order)
        # + per-lane 1/var for the emission moments (Gaussian only: HDP
        # expectation runs accumulate transitions, no kexp moments)
        in_specs = in_specs + [
            pl.BlockSpec((1, 1, T, S), lambda g, t: (g, NT - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM)]
        args = args + (cvecf,)
        if expect and not estream:
            in_specs = in_specs + [
                pl.BlockSpec((1, 1, S), lambda g, t: (g, 0, 0),
                             memory_space=pltpu.VMEM)]
            args = args + (ivar,)
    in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
    args = args + (fstack,)
    if estream:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        args = args + (estack,)
    ring_h = SUBPAD + WB + RB + SUBPAD
    out_shapes = (
        # fused log-posterior rows re-centered per diagonal (see fmax):
        # survivors live within ~5 nats of the fused max, so u16@1/512
        # is exact for every >=threshold cell. fuse_compact never
        # writes (or allocates) this stack — token-size dummy.
        jax.ShapeDtypeStruct((G, 8, WB, S) if fuse_compact
                             else (G, Dp1p, WB, S), jnp.uint16),
        jax.ShapeDtypeStruct((G, Dp1p, S), jnp.float32),
        jax.ShapeDtypeStruct((G, Dp1p, S), jnp.float32),
        # per-diagonal fused-row max: the quantization re-centering,
        # added back by the compaction normalizer
        jax.ShapeDtypeStruct((G, Dp1p, S), jnp.float32),
    )
    if expect:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((G, 8, S), jnp.float32),)
        if not estream:
            out_shapes = out_shapes + (
                jax.ShapeDtypeStruct((G, NT, 3, WB, S), jnp.float32),)
    if fuse_compact:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((G, rslot, Dp1p, S), jnp.int32),
            jax.ShapeDtypeStruct((G, Dp1p, S), jnp.int32),
        )
    assert (PP == 1 and not estream and not expect) or log_space, \
        "P>1 / streams / expectations require the log-space kernels"
    assert not (expect and (PP > 1 or not fuse_post))
    assert not (fuse_compact and (expect or not fuse_post or
                                  not log_space))
    kern = _bwd_kernel_log if log_space else _bwd_kernel
    kw = {"PP": PP, "estream": estream, "expect": expect,
          "fuse_compact": fuse_compact, "rslot": rslot,
          "log_thr": log_thr} if log_space else {}
    scratch = [pltpu.VMEM((7, ring_h, S), jnp.float32),
               pltpu.VMEM((NEV, SUBPAD + WB + 2, S), jnp.float32),
               pltpu.VMEM((8, S), jnp.float32),
               pltpu.VMEM((2, WB, S), jnp.uint16),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.VMEM(((2, 3, WB, S) if expect else (2, WB, S)),
                          jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]
    if estream:
        scratch += [pltpu.VMEM((3, WB + 8, S), jnp.float32),
                    pltpu.SemaphoreType.DMA((3,))]
    out_specs = ((pl.BlockSpec(memory_space=pl.ANY),)
                 + tuple(out_small) + (out_small[0],))
    if expect:
        out_specs = out_specs + (
            pl.BlockSpec((1, 8, S), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),)
        if not estream:
            out_specs = out_specs + (
                pl.BlockSpec((1, 1, 3, WB, S),
                             lambda g, t: (g, NT - 1 - t, 0, 0, 0),
                             memory_space=pltpu.VMEM),)
    if fuse_compact:
        out_specs = out_specs + (
            pl.BlockSpec((1, rslot, T, S),
                         lambda g, t: (g, 0, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, S), lambda g, t: (g, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM),
        )
    outs = pl.pallas_call(
        functools.partial(kern, T=T, WB=WB, S=S, RB=RB, Dpad=Dpad,
                          fuse_post=fuse_post, **kw),
        grid=(G, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    if expect:
        return outs          # (post, incr, lse, fmax, texp, kexp)
    if fuse_compact:
        _post, incr, lse, _fmax, slots, cnt = outs
        return incr, lse, slots, cnt
    post, incr, lse, fmax = outs
    return post, incr, lse, fmax


K_LANE = 16


def _compact_chunked(postlog, cvec, xoffs, widths, n_diag, log_thr, *,
                     K: int, C: int, pack16: bool = False,
                     interpret: bool = False, R: int = 5):
    """Survivor compaction dispatcher: Pallas-mapped rank-select path
    (fast, u8 packing) when the cell id fits 24 bits and the band
    offset fits 11 (XLA rank-select behind
    SIGNALALIGN_TPU_XLA_COMPACT=1), top-k path otherwise (pack16 /
    very wide bands).

    Returns (packed bytes (G, S, K, 4|5|6), counts (G, S),
    overflow (G, S) bool — True when a diagonal held more than R
    survivors (rank path only): the prefix is then incomplete and the
    caller must re-run that lane on an exact path).
    """
    G, Dp1p, WB, S = postlog.shape
    if not pack16 and Dp1p * WB <= (1 << 24) and WB < 2048:
        if os.environ.get("SIGNALALIGN_TPU_XLA_COMPACT") == "1":
            return _compact_rank(postlog, cvec, xoffs, widths, n_diag,
                                 log_thr, K=K, C=C)
        return _compact_rank_pl(postlog, cvec, n_diag, K=K, R=R,
                                log_thr=float(log_thr),
                                interpret=interpret)
    buf, counts = _compact_topk(postlog, cvec, xoffs, widths, n_diag,
                                log_thr, K=K, C=C, pack16=pack16)
    return buf, counts, jnp.zeros(counts.shape, dtype=jnp.bool_)


def _compact_map_kernel(postlog_ref, cvecm_ref, slots_ref, cnt_ref, *,
                        CD: int, WB: int, S: int, R: int,
                        log_thr: float):
    """Survivor-extraction map tile: one pass over a (CD, WB, S) u16
    postlog block held in VMEM, emitting per-diagonal survivor slots +
    counts. Replaces the XLA chunk map, which re-read the postlog
    volume ~9x (key build + R dependent reduces as separate fusions);
    here the block is DMAd once and the extraction runs in-register
    (measured: the XLA map alone cost as much as a full DP sweep)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (WB, S), 0)
    subkey = sub << 12
    IMAX = jnp.int32(0x7FFFFFFF)
    thr = jnp.float32(log_thr)
    for i in range(CD):
        pq = postlog_ref[0, i].astype(jnp.int32)
        cv = cvecm_ref[0, pl.ds(i, 1), :]                  # (1, S)
        v = pq.astype(jnp.float32) * jnp.float32(-1.0 / QSCALE) + cv
        valid = (pq < QMAX) & (v >= thr)
        qe = jnp.minimum(jnp.round(jnp.maximum(-v, 0.0) * QSCALE),
                         4095.0).astype(jnp.int32)
        key = jnp.where(valid, subkey | qe, IMAX)
        cnt_ref[0, 0, pl.ds(i, 1), :] = jnp.sum(
            valid.astype(jnp.int32), axis=0, keepdims=True)
        prev = jnp.full((1, S), -1, jnp.int32)
        for r in range(R):
            cur = jnp.where(key > prev, key, IMAX)
            nxt = jnp.min(cur, axis=0, keepdims=True)
            slots_ref[0, 0, r, pl.ds(i, 1), :] = nxt
            prev = nxt


@functools.partial(jax.jit,
                   static_argnames=("K", "R", "log_thr", "interpret"))
def _compact_rank_pl(postlog, cvec, n_diag, *, K: int, R: int = 8,
                     log_thr: float = float(np.log(0.01)),
                     interpret: bool = False):
    """Pallas-mapped rank-select compaction: same contract as
    _compact_rank (buf, counts, overflow) with the chunk map as a
    single-pass VMEM kernel. The global prefix-pack stays XLA (one
    ascending u32 sort)."""
    G, Dp1p, WB, S = postlog.shape
    IMAX = jnp.int32(0x7FFFFFFF)
    # rows past a lane's final diagonal are masked through cvec so the
    # kernel needs no per-lane scalars (Mosaic scalar-tile rules)
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    cvecm = jnp.where(d_idx <= n_diag[:, None, :], cvec,
                      jnp.float32(-3e38))
    # chunk depth must be 8-divisible (Mosaic block rule: last two block
    # dims (CD, S) need 8/128 divisibility) and divide Dp1p (a multiple
    # of T=120/240, so 24 and 8 both qualify; 12 does NOT — it lowers
    # only when CD equals the array dim)
    CD = next(c for c in (24, 8)
              if c * WB * S * 2 * 2 <= 10e6 or c == 8)
    NT2 = Dp1p // CD
    kern = functools.partial(_compact_map_kernel, CD=CD, WB=WB, S=S,
                             R=R, log_thr=log_thr)
    slots, cnt = pl.pallas_call(
        kern,
        grid=(G, NT2),
        in_specs=[
            pl.BlockSpec((1, CD, WB, S), lambda g, t: (g, t, 0, 0)),
            pl.BlockSpec((1, CD, S), lambda g, t: (g, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R, CD, S), lambda g, t: (g, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, CD, S), lambda g, t: (g, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, NT2, R, CD, S), jnp.int32),
            jax.ShapeDtypeStruct((G, NT2, CD, S), jnp.int32),
        ],
        interpret=interpret,
    )(postlog, cvecm)
    w = jnp.transpose(slots, (0, 4, 1, 3, 2)).reshape(G, S, Dp1p * R)
    d = (jnp.arange(Dp1p * R, dtype=jnp.uint32)
         // jnp.uint32(R))[None, None, :]
    wu = w.astype(jnp.uint32)
    pos = wu >> jnp.uint32(12)
    qe = (wu & jnp.uint32(4095)).astype(jnp.float32)
    p8 = jnp.round(jnp.exp(qe * jnp.float32(-1.0 / QSCALE))
                   * 255.0).astype(jnp.uint32)
    cell = d * jnp.uint32(WB) + pos
    key = jnp.where(w != IMAX, (cell << jnp.uint32(8)) | p8,
                    jnp.uint32(0xFFFFFFFF))
    key = jax.lax.sort(key, dimension=2)
    buf = jax.lax.bitcast_convert_type(key[:, :, :K], jnp.uint8)
    cntd = jnp.transpose(cnt, (0, 3, 1, 2)).reshape(G, S, Dp1p)
    counts = jnp.minimum(jnp.sum(jnp.minimum(cntd, R), axis=2),
                         K).astype(jnp.int32)
    overflow = jnp.any(cntd > R, axis=2)
    return buf, counts, overflow


@functools.partial(jax.jit, static_argnames=("K", "R", "WB"))
def _compact_from_slots(slots, cnt, *, K: int, R: int, WB: int):
    """Global prefix-pack for IN-KERNEL compacted survivors
    (_bwd_kernel_log fuse_compact): the backward sweep already emitted
    per-diagonal rank slots + counts; one ascending u32 sort yields the
    cell-ordered 4 B/pair buffer (same contract as _compact_rank_pl —
    buf, counts, overflow). The u16 posterior stack never existed."""
    G, R_, Dp1p, S = slots.shape
    IMAX = jnp.int32(0x7FFFFFFF)
    w = jnp.transpose(slots, (0, 3, 2, 1)).reshape(G, S, Dp1p * R)
    d = (jnp.arange(Dp1p * R, dtype=jnp.uint32)
         // jnp.uint32(R))[None, None, :]
    wu = w.astype(jnp.uint32)
    pos = wu >> jnp.uint32(12)
    qe = (wu & jnp.uint32(4095)).astype(jnp.float32)
    p8 = jnp.round(jnp.exp(qe * jnp.float32(-1.0 / QSCALE))
                   * 255.0).astype(jnp.uint32)
    cell = d * jnp.uint32(WB) + pos
    key = jnp.where(w != IMAX, (cell << jnp.uint32(8)) | p8,
                    jnp.uint32(0xFFFFFFFF))
    key = jax.lax.sort(key, dimension=2)
    buf = jax.lax.bitcast_convert_type(key[:, :, :K], jnp.uint8)
    counts = jnp.minimum(jnp.sum(jnp.minimum(cnt, R), axis=1),
                         K).astype(jnp.int32)
    overflow = jnp.any(cnt > R, axis=1)
    return buf, counts, overflow


@functools.partial(jax.jit, static_argnames=("K", "C", "R"))
def _compact_rank(postlog, cvec, xoffs, widths, n_diag, log_thr, *,
                  K: int, C: int, R: int = 8):
    """Rank-select survivor compaction — no top-k, no transpose, no
    cumsum.

    XLA's top_k lowers to a full bitonic sort per (diagonal, lane) row
    regardless of k (measured 230ms of a 270ms level-1 on a real-read
    W=512 stripe); survivor selection doesn't need value order at all.
    Survivors are extracted by ITERATIVE MIN-EXTRACTION: materialize a
    per-cell u32 key = (band offset << 12 | quantized -log p) (invalid
    cells -> 0xFFFFFFFF), then R dependent masked min-reduces along the
    band axis pull out the survivors in band order (slot r = min key
    strictly above slot r-1; keys are distinct because the band offset
    dominates). This replaced a cumsum-rank + R masked max-reduce
    formulation whose log-depth cumsum and per-slot recomputation cost
    ~60 vector passes/cell (measured: compaction ~= a full DP sweep);
    the key is built once and each slot is a single fused compare+min
    pass.

    Survivors come out in (diagonal, band offset) = cell order by
    construction, so the global step is a single ascending one-operand
    u32 sort of key = cell << 8 | p_u8 — whose little-endian bytes ARE
    the 4 B/pair [p_u8, cell_lo, cell_mid, cell_hi] fetch layout (host
    decode unchanged). Set membership is decided on the same f32 log
    values as the top-k path (bit-identical); p_u8 is re-derived from
    the 1/512 nat quantized log (<=1 ulp difference vs the f32 exp).

    A diagonal with more than R survivors overflows the rank slots:
    reported via the overflow flag, caller re-runs that lane exactly
    (bundled reads peak well under R=8 per diagonal per lane).
    """
    G, Dp1p, WB, S = postlog.shape
    NC = Dp1p // C
    UMAX = jnp.uint32(0xFFFFFFFF)

    def chunk(ci):
        c0 = ci * C
        pq = jax.lax.dynamic_slice_in_dim(postlog, c0, C, axis=1)
        pl_ = _dequant_rows(pq)
        cv = jax.lax.dynamic_slice_in_dim(cvec, c0, C, axis=1)
        d_idx = (c0 + jnp.arange(C, dtype=jnp.int32))[None, :, None]
        sub = jnp.arange(WB, dtype=jnp.uint32)[None, None, :, None]
        v = pl_ + cv[:, :, None, :]
        # out-of-band cells arrive as the QMAX sentinel (the backward
        # kernel writes NEG there before quantization), so the band
        # geometry mask is redundant here
        valid = ((d_idx[..., None] <= n_diag[:, None, None, :]) &
                 (pq < QMAX) & (v >= log_thr))
        qe = jnp.minimum(jnp.round(jnp.maximum(-v, 0.0) * QSCALE),
                         4095.0).astype(jnp.uint32)
        key = jnp.where(valid, (sub << jnp.uint32(12)) | qe, UMAX)
        cnt = jnp.sum(valid.astype(jnp.int32), axis=2)    # (G, C, S)
        slots = []
        prev = None
        for r in range(R):
            cur = key if prev is None else \
                jnp.where(key > prev[:, :, None, :], key, UMAX)
            nxt = jnp.min(cur, axis=2)                    # (G, C, S)
            slots.append(nxt)
            prev = nxt
        return jnp.stack(slots, axis=-1), cnt    # (G,C,S,R), (G,C,S)

    ws, cnts = jax.lax.map(chunk, jnp.arange(NC))
    w = jnp.transpose(ws, (1, 3, 0, 2, 4)).reshape(G, S, Dp1p * R)
    d = (jnp.arange(Dp1p * R, dtype=jnp.uint32)
         // jnp.uint32(R))[None, None, :]
    pos = w >> jnp.uint32(12)
    qe = (w & jnp.uint32(4095)).astype(jnp.float32)
    p8 = jnp.round(jnp.exp(qe * jnp.float32(-1.0 / QSCALE))
                   * 255.0).astype(jnp.uint32)
    cell = d * jnp.uint32(WB) + pos
    key = jnp.where(w != UMAX, (cell << jnp.uint32(8)) | p8, UMAX)
    key = jax.lax.sort(key, dimension=2)
    buf = jax.lax.bitcast_convert_type(key[:, :, :K], jnp.uint8)
    counts = jnp.minimum(jnp.sum(jnp.minimum(cnts, R), axis=(0, 2)),
                         K).astype(jnp.int32)              # (G, S)
    overflow = jnp.any(cnts > R, axis=(0, 2))
    return buf, counts, overflow


@functools.partial(jax.jit, static_argnames=("K", "C", "pack16"))
def _compact_topk(postlog, cvec, xoffs, widths, n_diag, log_thr, *,
                  K: int, C: int, pack16: bool = False):
    """Masked two-level top-k over log-posteriors, chunked along diagonals
    so the (S, WB) transpose intermediates stay small.

    postlog: (G, Dp1p, WB, S) unnormalized f+b; cvec: (G, Dp1p, S).
    Returns (packed byte buffer (G, S, K, 4|5|6), counts (G, S)).

    The surviving (>= threshold, decided on the f32 log values — set
    membership is bit-identical to the XLA extract path) entries are
    sorted by cell id = (diagonal, band offset), i.e. already in the
    (x+y, x) output order, and placed in a prefix of length counts[g, s]:
    the host fetches ONLY that prefix and decodes with pure slicing — no
    host-side sort or filter. The fetch this feeds is the wall-clock
    bottleneck on slow device links, so the default packing is 4 B/pair:
    u8 posterior (value resolution 1/255 — an order under the reference's
    own chunked-traceback output approximation; membership is unaffected)
    + 24-bit cell id. ``pack16`` selects 5 B/pair with a u16 posterior
    (resolution 1.5e-5) for exactness-critical runs.
    """
    G, Dp1p, WB, S = postlog.shape
    NC = Dp1p // C

    def chunk(ci):
        c0 = ci * C
        pq = jax.lax.dynamic_slice_in_dim(postlog, c0, C, axis=1)
        pl_ = _dequant_rows(pq)
        cv = jax.lax.dynamic_slice_in_dim(cvec, c0, C, axis=1)
        xo = jax.lax.dynamic_slice_in_dim(xoffs, c0, C, axis=1)
        wd = jax.lax.dynamic_slice_in_dim(widths, c0, C, axis=1)
        d_idx = (c0 + jnp.arange(C, dtype=jnp.int32))[None, :, None]
        sub = jnp.arange(WB, dtype=jnp.int32)[None, None, :, None]
        mask = ((sub >= xo[:, :, None, :]) &
                (sub < (xo + wd)[:, :, None, :]) &
                (d_idx[..., None] <= n_diag[:, None, None, :]) &
                (pq < QMAX))          # u16 clamp sentinel = effectively -inf
        v = jnp.where(mask, pl_ + cv[:, :, None, :], NEG)
        vt = jnp.swapaxes(v, 2, 3)                 # (G, C, S, WB)
        v1, i1 = jax.lax.top_k(vt, K_LANE)         # (G, C, S, K_LANE)
        return v1, i1

    v1s, i1s = jax.lax.map(chunk, jnp.arange(NC))  # (NC, G, C, S, KL)
    v1 = jnp.transpose(v1s, (1, 3, 0, 2, 4)).reshape(G, S, Dp1p * K_LANE)
    i1 = jnp.transpose(i1s, (1, 3, 0, 2, 4)).reshape(G, S, Dp1p * K_LANE)
    v2, i2 = jax.lax.top_k(v1, K)
    d2 = i2 // K_LANE
    wb2 = jnp.take_along_axis(i1, i2, axis=2)
    cell = (d2.astype(jnp.uint32) * jnp.uint32(WB)
            + wb2.astype(jnp.uint32))
    # validity on the f32 logs (== XLA set membership); survivors sorted
    # by cell id into a counts-long prefix, losers keyed to the end
    valid = (v2 >= log_thr) & (v2 > NEG / 2)
    counts = jnp.sum(valid.astype(jnp.int32), axis=-1)
    order = jnp.argsort(jnp.where(valid, cell, jnp.uint32(0xFFFFFFFF)),
                        axis=-1)
    v2 = jnp.take_along_axis(v2, order, axis=-1)
    cell = jnp.take_along_axis(cell, order, axis=-1)
    p = jnp.exp(jnp.minimum(v2, 0.0))
    small_cell = Dp1p * WB <= (1 << 24)
    cell_lo = (cell & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    cell_hi = ((cell >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.uint8)
    if pack16:
        p16 = jnp.round(p * 65535.0).astype(jnp.uint16)
        parts = [jax.lax.bitcast_convert_type(p16, jnp.uint8)]
    else:
        parts = [jnp.round(p * 255.0).astype(jnp.uint8)[..., None]]
    if small_cell:
        # one contiguous byte buffer -> a single host fetch (per-transfer
        # latency on remote links is significant)
        parts += [jax.lax.bitcast_convert_type(cell_lo, jnp.uint8),
                  cell_hi[..., None]]
    else:
        parts += [jax.lax.bitcast_convert_type(cell, jnp.uint8)]
    return jnp.concatenate(parts, axis=-1), counts


@functools.partial(jax.jit, static_argnames=("T", "XW", "log_thr"))
def _site_marginals(postlog, cvec, n_diag, bank, site_slot, *, T: int,
                    XW: int, log_thr: float):
    """Per-(reference position, lane) posterior sums, on device.

    Variant/methylation calling only needs per-SITE posterior mass
    (variantCaller.py:123-187 sums each site's event posteriors before
    normalizing across candidate bases) — fetching per-pair streams to
    compute host-side sums wastes the host link. Sum the u16 posterior
    stack over events per x instead: one pass reduces each tile's
    diagonals (frame base is constant within a tile), a 128-granular
    bank combine aligns tiles into a per-lane x-axis (the kexp
    structure), and a gather picks the requested site slots. Only
    (n_sites, lanes) f32 cross the link: < 1 B/event for CpG-scale site
    densities.

    postlog: (G, Dp1p, WB, S) u16; cvec: (G, Dp1p, S) absolute
    normalizer; bank: (G, NT, S) per-lane 128-granular tile-frame
    offsets; site_slot: (G, NS, S) i32 accumulator slots
    (global x - frame_base0), -1 invalid. Returns (G, NS, S) f32.
    """
    G, Dp1p, WB, S = postlog.shape
    NT = Dp1p // T
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    cvecm = jnp.where(d_idx <= n_diag[:, None, :], cvec,
                      jnp.float32(-3e38))
    lp = (postlog.astype(jnp.float32) * jnp.float32(-1.0 / QSCALE)
          + cvecm[:, :, None, :])
    # same report threshold as the pair stream (signalMachine's output
    # cutoff), so site sums equal summing the reported pairs
    p = jnp.where(lp >= jnp.float32(log_thr), jnp.exp(lp), 0.0)
    tile_sum = p.reshape(G, NT, T, WB, S).sum(axis=2)     # (G, NT, WB, S)
    NBANK = max((XW - WB) // 128 + 1, 1)
    xacc = jnp.zeros((G, XW, S), jnp.float32)
    for b in range(NBANK):
        m = (bank == b)[:, :, None, :]
        contrib = jnp.sum(jnp.where(m, tile_sum, 0.0), axis=1)
        xacc = xacc + jnp.pad(
            contrib, ((0, 0), (b * 128, XW - WB - b * 128), (0, 0)))
    slot = jnp.clip(site_slot, 0, XW - 1)
    out = jnp.take_along_axis(xacc, slot, axis=1)
    return jnp.where(site_slot >= 0, out, 0.0)


@jax.jit
def _delta_encode_pairs(buf, counts):
    """Delta-compress the packed pair prefix for slow host links.

    The compaction emits 4 B/pair ([p_u8, cell_lo, cell_mid, cell_hi],
    the little-endian bytes of the ascending-sorted u32 key) — at ~1.08
    pairs/event that is what binds the end-to-end rate on PCIe-less
    links. Survivors are cell-sorted with cell = d*WB + band-slot, so
    consecutive cells differ by < ~2*WB (a diagonal hop) essentially
    always: emit (a) a 3 B/pair stream [p_u8, delta_lo, delta_hi]
    (16-bit delta, 0xFFFF flagging an escape — deltas over 65535 mean a
    >= ~60-diagonal survivor gap, which only packing glue or sparse
    tiles produce) and (b) an ascending stream of the escaped ABSOLUTE
    cell ids (escapes appear in cell order in both streams, so a plain
    sort aligns them). Lossless.

    Returns (A (G, S, K, 3) u8, B (G, S, K) u32 escape prefix,
    n_escape (G, S) i32)."""
    G, S, K, _ = buf.shape
    # u8 (G,S,K,4) -> u32 (G,S,K): bitcast absorbs the byte axis
    key = jax.lax.bitcast_convert_type(buf, jnp.uint32)
    cells = key >> jnp.uint32(8)
    p8 = (key & jnp.uint32(0xFF)).astype(jnp.uint8)
    valid = (jnp.arange(K, dtype=jnp.int32)[None, None, :]
             < counts[:, :, None])
    prev = jnp.concatenate(
        [jnp.zeros((G, S, 1), jnp.uint32), cells[:, :, :-1]], axis=2)
    delta = cells - prev
    esc = (delta > jnp.uint32(0xFFFE)) & valid
    d16 = jnp.where(esc, jnp.uint32(0xFFFF), delta)
    A = jnp.stack([p8,
                   (d16 & jnp.uint32(0xFF)).astype(jnp.uint8),
                   (d16 >> jnp.uint32(8)).astype(jnp.uint8)], axis=-1)
    B = jax.lax.sort(jnp.where(esc, cells, jnp.uint32(0xFFFFFFFF)),
                     dimension=2)
    nesc = jnp.sum(esc.astype(jnp.int32), axis=2)
    return A, B, nesc


def _delta_decode_pairs(a_h, b_h, counts_h, nesc_h):
    """Host inverse of _delta_encode_pairs -> (p_u8 f64/255, cell u32),
    shaped like the direct-fetch decode inputs. All-int32 vectorized
    (cells fit 24 bits): ~4 passes over the prefix."""
    G, S, K, _ = a_h.shape
    p_h = a_h[..., 0].astype(np.float64) / 255.0
    d16 = (a_h[..., 1].astype(np.int32)
           | (a_h[..., 2].astype(np.int32) << 8))
    valid = (np.arange(K, dtype=np.int32)[None, None, :]
             < counts_h[:, :, None].astype(np.int32))
    esc = (d16 == 0xFFFF) & valid
    d_noesc = np.where(esc | ~valid, np.int32(0), d16)
    cs = np.cumsum(d_noesc, axis=2, dtype=np.int32)
    # escape j of a lane replaces the running cell with b_h[j]; the
    # offset (absolute - inclusive-cumsum-at-escape) strictly increases
    # across a lane's escapes (each escape jumps the cell by more than
    # the intervening deltas), so a running max forward-fills it
    NEGS = np.int32(-(1 << 30))
    eidx = np.cumsum(esc, axis=2, dtype=np.int32)
    eidx -= 1
    if b_h.shape[2]:
        np.clip(eidx, 0, b_h.shape[2] - 1, out=eidx)
        absv = np.take_along_axis(b_h.astype(np.int32), eidx, axis=2)
        off = np.maximum.accumulate(
            np.where(esc, absv - cs, NEGS), axis=2)
        off = np.where(off <= NEGS, np.int32(0), off)
        cs += off
    cell_h = cs.astype(np.uint32)
    return p_h, cell_h


@functools.partial(jax.jit, static_argnames=("T", "PP"))
def _totals_cvec_df(f_incr, b_incr, f_lse, b_lse, n_diag, *, T: int,
                    PP: int = 1):
    """Per-diagonal normalization vector + totals, entirely on device.

    The inter-tile prefix sums of the rescaling offsets need ~double
    precision (magnitudes ~1e5 cancelling to O(1)); instead of fetching the
    per-tile sums and running a float64 prefix on host (a 2MB transfer per
    batch over the device link), run a compensated (two-float / TwoSum)
    prefix in f32 on device, which carries the same effective precision.
    Returns (cvec, tf_hi, tf_lo, tb_hi, tb_lo).
    """
    G, Dp1p, S = f_incr.shape
    NT = Dp1p // T
    ft = f_incr.reshape(G, NT, T, S)
    bt = b_incr.reshape(G, NT, T, S)
    fsum = jnp.sum(ft, axis=2)
    bsum = jnp.sum(bt, axis=2)
    f_intra = jnp.cumsum(ft, axis=2).reshape(G, Dp1p, S)
    b_intra = jnp.cumsum(bt[:, :, ::-1], axis=2)[:, :, ::-1] \
        .reshape(G, Dp1p, S)

    def two_sum(a, b):
        srt = a + b
        v = srt - a
        e = (a - (srt - v)) + (b - v)
        return srt, e

    def df_exclusive_scan(x, reverse):
        # log-depth compensated prefix: a sequential lax.scan over NT
        # tiles is dispatch-bound (~70 tiny steps); an associative scan
        # with double-float (TwoSum-compensated) addition keeps the
        # same effective precision in ~log2(NT) fused levels
        def dd_add(a, b):
            s, e = two_sum(a[0], b[0])
            return s, e + a[1] + b[1]

        xs = x[:, ::-1, :] if reverse else x
        his, los = jax.lax.associative_scan(
            dd_add, (xs, jnp.zeros_like(xs)), axis=1)
        # inclusive -> exclusive
        his = jnp.concatenate([jnp.zeros_like(his[:, :1]), his[:, :-1]],
                              axis=1)
        los = jnp.concatenate([jnp.zeros_like(los[:, :1]), los[:, :-1]],
                              axis=1)
        if reverse:
            his, los = his[:, ::-1], los[:, ::-1]
        return his, los

    fb_hi, fb_lo = df_exclusive_scan(fsum, False)   # fbase[t] = sum fsum[:t]
    bb_hi, bb_lo = df_exclusive_scan(bsum, True)    # bbase[t] = sum bsum[t+1:]

    nd = n_diag[:, None, :]
    f_lse_nd = jnp.take_along_axis(f_lse, nd, axis=1)[:, 0]
    f_intra_nd = jnp.take_along_axis(f_intra, nd, axis=1)[:, 0]
    tD = (n_diag // T)[:, None, :]
    tf_base_hi = jnp.take_along_axis(fb_hi, tD, axis=1)[:, 0]
    tf_base_lo = jnp.take_along_axis(fb_lo, tD, axis=1)[:, 0]
    h1, e1 = two_sum(tf_base_hi, f_lse_nd)
    tf_hi, e2 = two_sum(h1, f_intra_nd)
    tf_lo = tf_base_lo + (e1 + e2)
    h1, e1 = two_sum(bb_hi[:, 0, :], b_lse[:, 0, :])
    tb_hi, e2 = two_sum(h1, b_intra[:, 0, :])
    tb_lo = e1 + e2

    if PP > 1:
        # paths-in-lanes: the posterior normalizer must be the JOINT
        # total over each read's PP path-lanes (per-path-lane forward
        # totals condition on the ending path and can be -inf/NaN for
        # paths with no end mass). Keep the compensated (hi, lo) pair
        # through the logsumexp: hi - max is exact for nearby operands
        # and lo is O(ulp), so rel carries full double-float precision
        # while the block max preserves the large magnitude.
        fin = jnp.isfinite(tf_hi + tf_lo)
        hi = jnp.where(fin, tf_hi, -jnp.inf).reshape(G, S // PP, PP)
        lo = jnp.where(fin, tf_lo, 0.0).reshape(G, S // PP, PP)
        m = jnp.max(hi, axis=2, keepdims=True)
        mok = jnp.where(jnp.isfinite(m), m, 0.0)
        rel = (hi - mok) + lo
        jv = jnp.log(jnp.maximum(jnp.sum(jnp.exp(rel), axis=2), 1e-37))
        tfn_hi = jnp.repeat(mok[..., 0], PP, axis=1)
        tfn_lo = jnp.repeat(jv, PP, axis=1)
    else:
        tfn_hi, tfn_lo = tf_hi, tf_lo

    # c_tile = fbase + bbase - total_f, with the large cancellation carried
    # through compensated terms
    h1, e1 = two_sum(fb_hi, bb_hi)
    h2, e2 = two_sum(h1, -tfn_hi[:, None, :])
    c_tile = h2 + (e1 + e2 + fb_lo + bb_lo - tfn_lo[:, None, :])
    cvec = (f_intra.reshape(G, NT, T, S)
            + b_intra.reshape(G, NT, T, S)
            + c_tile[:, :, None, :]).reshape(G, Dp1p, S)
    return cvec, tf_hi, tf_lo, tb_hi, tb_lo


@functools.partial(jax.jit, static_argnames=("T", "PP", "SEGMAX"))
def _totals_cvec_df_seg(f_incr, b_incr, f_lse, b_lse, seg_start, seg_end,
                        seg_valid, *, T: int, PP: int = 1, SEGMAX: int = 1):
    """Segment-aware generalization of ``_totals_cvec_df`` for
    lane-packed problems (ops/packing.py): per-diagonal rescale offsets
    telescope per segment, so

      total_f(seg) = f_lse[e] + O_f(e) - O_f(s) + f_incr[s]
      total_b(seg) = b_lse[s] + O_b(s) - O_b(e) + b_incr[e]
      cvec[d]      = O_f(d) + O_b(d)
                     - (O_f(s)-f_incr[s] + O_b(e)-b_incr[e] + total_f)

    with O_f/O_b the inclusive double-float forward/backward prefix sums
    of the rescale increments and (s, e) the diagonal's segment bounds.
    seg_start/seg_end: (G, SEGMAX, S) i32 (gather-safe, i.e. < Dp1p);
    seg_valid: same shape, 0 marks padding slots. Returns
    (cvec (G,Dp1p,S), tf_hi, tf_lo, tb_hi, tb_lo each (G, SEGMAX, S)).
    For SEGMAX == 1 with (0, n_diag) bounds this reproduces
    ``_totals_cvec_df`` (O_f(0)-f_incr[0] == 0; O_b past a lane's is_end
    row is 0 — width-0 rows and end injections force zero increments).
    """
    G, Dp1p, S = f_incr.shape
    NT = Dp1p // T
    ft = f_incr.reshape(G, NT, T, S)
    bt = b_incr.reshape(G, NT, T, S)
    f_intra = jnp.cumsum(ft, axis=2).reshape(G, Dp1p, S)
    b_intra = jnp.cumsum(bt[:, :, ::-1], axis=2)[:, :, ::-1] \
        .reshape(G, Dp1p, S)
    fsum = jnp.sum(ft, axis=2)
    bsum = jnp.sum(bt, axis=2)

    def two_sum(a, b):
        srt = a + b
        v = srt - a
        e = (a - (srt - v)) + (b - v)
        return srt, e

    def dd_add(a, b):
        s, e = two_sum(a[0], b[0])
        return s, e + a[1] + b[1]

    def df_exclusive_scan(x, reverse):
        xs = x[:, ::-1, :] if reverse else x
        his, los = jax.lax.associative_scan(
            dd_add, (xs, jnp.zeros_like(xs)), axis=1)
        his = jnp.concatenate([jnp.zeros_like(his[:, :1]), his[:, :-1]],
                              axis=1)
        los = jnp.concatenate([jnp.zeros_like(los[:, :1]), los[:, :-1]],
                              axis=1)
        if reverse:
            his, los = his[:, ::-1], los[:, ::-1]
        return his, los

    fb_hi, fb_lo = df_exclusive_scan(fsum, False)
    bb_hi, bb_lo = df_exclusive_scan(bsum, True)
    rep = lambda a: jnp.broadcast_to(a[:, :, None, :],
                                     (G, NT, T, S)).reshape(G, Dp1p, S)
    fbh_d, fbl_d = rep(fb_hi), rep(fb_lo)
    bbh_d, bbl_d = rep(bb_hi), rep(bb_lo)

    ga = lambda A, idx: jnp.take_along_axis(A, idx, axis=1)

    def of_at(idx):      # inclusive O_f at diagonals idx -> df pair
        return dd_add((ga(fbh_d, idx), ga(fbl_d, idx)),
                      (ga(f_intra, idx), jnp.zeros_like(idx, jnp.float32)))

    def ob_at(idx):      # inclusive O_b at diagonals idx
        return dd_add((ga(bbh_d, idx), ga(bbl_d, idx)),
                      (ga(b_intra, idx), jnp.zeros_like(idx, jnp.float32)))

    zs = lambda x: jnp.zeros_like(x)
    s_, e_ = seg_start, seg_end
    of_e = of_at(e_)
    of_s = of_at(s_)
    ob_s = ob_at(s_)
    ob_e = ob_at(e_)
    f_incr_s = ga(f_incr, s_)
    b_incr_e = ga(b_incr, e_)
    # O_f(s-1) = O_f(s) - f_incr[s]; O_b(e+1) = O_b(e) - b_incr[e]
    of_sm1 = dd_add(of_s, (-f_incr_s, zs(f_incr_s)))
    ob_ep1 = dd_add(ob_e, (-b_incr_e, zs(b_incr_e)))
    tf = dd_add(of_e, dd_add((ga(f_lse, e_), zs(f_incr_s)),
                             ((-of_sm1[0], -of_sm1[1]))))
    tb = dd_add(ob_s, dd_add((ga(b_lse, s_), zs(f_incr_s)),
                             ((-ob_ep1[0], -ob_ep1[1]))))
    tf_hi, tf_lo = tf
    tb_hi, tb_lo = tb

    if PP > 1:
        # joint total over each read's PP path-lanes, per segment
        # (packed path-lanes of one read carry identical segment maps)
        fin = jnp.isfinite(tf_hi + tf_lo) & (seg_valid > 0)
        hi = jnp.where(fin, tf_hi, -jnp.inf).reshape(G, SEGMAX,
                                                     S // PP, PP)
        lo = jnp.where(fin, tf_lo, 0.0).reshape(G, SEGMAX, S // PP, PP)
        m = jnp.max(hi, axis=3, keepdims=True)
        mok = jnp.where(jnp.isfinite(m), m, 0.0)
        rel = (hi - mok) + lo
        jv = jnp.log(jnp.maximum(jnp.sum(jnp.exp(rel), axis=3), 1e-37))
        tfn_hi = jnp.repeat(mok[..., 0], PP, axis=2)
        tfn_lo = jnp.repeat(jv, PP, axis=2)
    else:
        tfn_hi, tfn_lo = tf_hi, tf_lo

    # per-segment posterior constant, expanded over the segment's
    # diagonal range (padding slots masked; glue/padding diagonals get
    # whatever fell through — their band widths are 0 so compaction
    # never reads them)
    c_seg = dd_add(dd_add(of_sm1, ob_ep1), (tfn_hi, tfn_lo))
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    ch = jnp.zeros((G, Dp1p, S), jnp.float32)
    cl = jnp.zeros((G, Dp1p, S), jnp.float32)
    for i in range(SEGMAX):
        m_i = ((d_idx >= s_[:, i:i + 1, :]) & (d_idx <= e_[:, i:i + 1, :])
               & (seg_valid[:, i:i + 1, :] > 0))
        ch = ch + jnp.where(m_i, c_seg[0][:, i:i + 1, :], 0.0)
        cl = cl + jnp.where(m_i, c_seg[1][:, i:i + 1, :], 0.0)

    h1, e1 = two_sum(fbh_d, bbh_d)
    h2, e2 = two_sum(h1, -ch)
    c_d = h2 + (e1 + e2 + fbl_d + bbl_d - cl)
    cvec = f_intra + b_intra + c_d
    return cvec, tf_hi, tf_lo, tb_hi, tb_lo


@functools.partial(jax.jit, static_argnames=("T", "SEGMAX"))
def _cvecf_expect_seg(f_incr, f_lse, seg_start, seg_end, seg_valid, *,
                      T: int, SEGMAX: int = 1):
    """Segment-aware ``_cvecf_expect``: per-diagonal
    Fo(d) - Fo(s-1) - total_f(seg(d)) for the expectation kernel's
    normalizer stream."""
    G, Dp1p, S = f_incr.shape
    NT = Dp1p // T
    ft = f_incr.reshape(G, NT, T, S)
    intra = jnp.cumsum(ft, axis=2)

    def two_sum(a, b):
        s = a + b
        v = s - a
        return s, (a - (s - v)) + (b - v)

    def dd_add(x, y):
        s, e = two_sum(x[0], y[0])
        return s, e + x[1] + y[1]

    tsum = jnp.sum(ft, axis=2)
    bh, bl = jax.lax.associative_scan(
        dd_add, (tsum, jnp.zeros_like(tsum)), axis=1)
    bh = jnp.concatenate([jnp.zeros_like(bh[:, :1]), bh[:, :-1]], axis=1)
    bl = jnp.concatenate([jnp.zeros_like(bl[:, :1]), bl[:, :-1]], axis=1)
    fo_hi = (bh[:, :, None, :] + intra).reshape(G, Dp1p, S)
    fo_lo = jnp.broadcast_to(bl[:, :, None, :],
                             (G, NT, T, S)).reshape(G, Dp1p, S)

    ga = lambda A, idx: jnp.take_along_axis(A, idx, axis=1)
    s_, e_ = seg_start, seg_end
    zs = jnp.zeros_like(s_, dtype=jnp.float32)
    of = lambda idx: dd_add((ga(fo_hi, idx), ga(fo_lo, idx)),
                            (ga(f_incr, idx) * 0.0, zs))
    of_e = dd_add((ga(fo_hi, e_), ga(fo_lo, e_)), (zs, zs))
    of_s = dd_add((ga(fo_hi, s_), ga(fo_lo, s_)), (zs, zs))
    f_incr_s = ga(f_incr, s_)
    of_sm1 = dd_add(of_s, (-f_incr_s, zs))
    total = dd_add(of_e, dd_add((ga(f_lse, e_), zs),
                                (-of_sm1[0], -of_sm1[1])))
    # C2(seg) = O_f(s-1) + total_f(seg); cvecf[d] = O_f(d) - C2(seg(d))
    c2 = dd_add(of_sm1, total)
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    ch = jnp.zeros((G, Dp1p, S), jnp.float32)
    cl = jnp.zeros((G, Dp1p, S), jnp.float32)
    for i in range(SEGMAX):
        m_i = ((d_idx >= s_[:, i:i + 1, :]) & (d_idx <= e_[:, i:i + 1, :])
               & (seg_valid[:, i:i + 1, :] > 0))
        ch = ch + jnp.where(m_i, c2[0][:, i:i + 1, :], 0.0)
        cl = cl + jnp.where(m_i, c2[1][:, i:i + 1, :], 0.0)
    cv = (fo_hi - ch) + (fo_lo - cl)
    cv = jnp.where(jnp.isfinite(cv), jnp.maximum(cv, NEG), NEG)
    return cv.reshape(G, NT, T, S)


@functools.partial(jax.jit, static_argnames=("T",))
def _cvecf_expect(f_incr, f_lse, n_diag, *, T: int):
    """Per-diagonal Fo(d) - total_f, reshaped to forward-tile blocks for
    the expectation kernel's normalizer stream; garbage rows clamped
    finite so exp() in the kernel yields exact zeros, never NaN."""
    G, Dp1p, S = f_incr.shape
    NT = Dp1p // T
    ft = f_incr.reshape(G, NT, T, S)
    intra = jnp.cumsum(ft, axis=2)

    # inter-tile prefix with double-float compensation (the magnitudes
    # reach ~1e4-1e5 and cancel to O(1) against the total; plain f32
    # cumsum would bias every expectation by exp(~0.01) on long reads)
    def two_sum(a, b):
        s = a + b
        v = s - a
        return s, (a - (s - v)) + (b - v)

    def dd_add(x, y):
        s, e = two_sum(x[0], y[0])
        return s, e + x[1] + y[1]

    tsum = jnp.sum(ft, axis=2)
    bh, bl = jax.lax.associative_scan(
        dd_add, (tsum, jnp.zeros_like(tsum)), axis=1)
    bh = jnp.concatenate([jnp.zeros_like(bh[:, :1]), bh[:, :-1]], axis=1)
    bl = jnp.concatenate([jnp.zeros_like(bl[:, :1]), bl[:, :-1]], axis=1)
    fo_hi = (bh[:, :, None, :] + intra).reshape(G, Dp1p, S)
    fo_lo = jnp.broadcast_to(bl[:, :, None, :],
                             (G, NT, T, S)).reshape(G, Dp1p, S)
    nd = n_diag[:, None, :]
    total = (jnp.take_along_axis(fo_hi, nd, axis=1)
             + jnp.take_along_axis(fo_lo, nd, axis=1)
             + jnp.take_along_axis(f_lse, nd, axis=1))[:, 0]
    cv = (fo_hi - total[:, None, :]) + fo_lo
    cv = jnp.where(jnp.isfinite(cv), jnp.maximum(cv, NEG), NEG)
    return cv.reshape(G, NT, T, S)


@functools.partial(jax.jit, static_argnames=("K", "XW"))
def _kexp_reduce_banked(kexp_tiles, bank, ids_by_x, *, K: int, XW: int):
    """Segment-sum the per-tile emission moments by kmer id, exploiting
    the x-frame structure: tile frames are 128-aligned, so each tile's
    (3, WB, S) block lands at a STATIC 128-granular offset in a per-lane
    x-aligned accumulator (bank selects + static slice-adds), collapsing
    the NT-times-overlapping tile windows BEFORE the element scatter.
    The remaining scatter runs on XW ~ LX slots instead of NT*WB
    (measured 8x fewer indices; the naive all-tile scatter was 137ms on
    a Dp1p=4200 stripe — the dominant cost of the whole expect pass).

    kexp_tiles: (G, NT, 3, WB, S); bank: (G, NT, S) i32 — per-lane
    128-granular tile-frame offset (frame_base[t] - frame_base[0])//128;
    ids_by_x: (G, XW, S) i32 — kmer id of accumulator slot x (the TO
    match cell frame_base[0] + x + 1), -1 invalid. Returns (G, S, 3, K).
    """
    G, NT, _, WB, S = kexp_tiles.shape
    NBANK = max((XW - WB) // 128 + 1, 1)
    parts = []
    for b in range(NBANK):
        m = (bank == b)[:, :, None, None, :]          # (G, NT, 1, 1, S)
        contrib = jnp.sum(jnp.where(m, kexp_tiles, 0.0), axis=1)
        parts.append(jnp.pad(contrib,
                             ((0, 0), (0, 0), (b * 128, XW - WB - b * 128),
                              (0, 0))))
    xacc = sum(parts)                                  # (G, 3, XW, S)
    data = jnp.transpose(xacc, (0, 3, 1, 2)).reshape(G * S, 3, XW)
    idf = jnp.transpose(ids_by_x, (0, 2, 1)).reshape(G * S, XW)
    idf = jnp.where(idf >= 0, idf, K)

    def one(d, i):
        return jnp.zeros((3, K + 1), d.dtype).at[:, i].add(d)
    out = jax.vmap(one)(data, idf)[:, :, :K]
    return out.reshape(G, S, 3, K)


def choose_lanes(n_diag_max: int, W: int, T: int = 24,
                 hbm_budget: Optional[float] = None) -> int:
    """Lane count per dispatch. Mosaic requires the full 128-lane tile
    (slicing a narrower lane dim fails to lower), so this is always 128;
    HBM pressure from long reads is handled by the u16 stack quantization
    plus `stack_bytes`-driven pipelining depth instead."""
    return 128


def stack_bytes(n_diag_max: int, W: int, S: int = 128, T: int = 120) -> int:
    """In-flight HBM for one dispatch's DP stacks: f32 forward match
    rows (full dynamic range) + u16 fused log-posterior (re-centered per
    diagonal), (Dp1p, WB, S) each."""
    WB = W + T + 128
    Dp1p = ((n_diag_max + T) // T + 1) * T
    return Dp1p * WB * (4 + 2) * S




class PallasBatchAligner:
    """Lane-batched (S reads per group) persistent-array runner."""

    def __init__(self, problems: Sequence[bfb.BandedProblem], W: int,
                 T: int = 240, S: int = 32, RB: int = 256,
                 interpret: bool = False, log_space: bool = False,
                 P: int = 1, expect: bool = False, device=None):
        """``log_space=True`` selects the log-domain kernel bodies:
        exact for unbounded within-band dynamic range (real bundled
        reads need up to ~4700 nats below the diagonal ridge) at ~0.7x
        the probability-space sweep speed (measured 5.6M vs 7.6M
        events/s/chip at W=512, S=128 — the DP is latency-bound on the
        serial diagonal dependency chain, so the transcendental count
        matters less than pass count). The probability-space kernels
        (``log_space=False``) cover ~157 nats (2^100-centered f32,
        event-normalized emissions, max-frame leapfrog rescaling) and
        are pair-exact when the range fits — callers must gate on the
        tf/tb residual (``numerics_suspect``) and re-run flagged lanes
        on an exact path."""
        modes = {p.mode for p in problems}
        assert len(modes) == 1 and modes <= {bfb.MODE_MEAN_ONLY,
                                             bfb.MODE_HDP}
        # MODE_HDP emissions arrive as a device-precomputed stream
        # (ops/emission_stream.py); the DP kernels DMA one row per
        # diagonal instead of evaluating Gaussians inline
        self.estream = problems[0].mode == bfb.MODE_HDP
        assert not self.estream or log_space, \
            "HDP emission streams require log_space=True"
        # EM expectation accumulation (device texp/kexp): P=1 log-space
        # only; the forward stack triples (all three states). HDP-mode
        # expect runs accumulate transitions only (threeStateHdp EM;
        # emissions train via Gibbs on thresholded assignments).
        self.expect = expect
        assert not expect or (log_space and P == 1)
        # P > 1 (degenerate-base expansion) runs paths-in-lanes: each
        # problem occupies PP consecutive lanes (PP = P padded to a
        # divisor of the 128-lane tile), cross-path transitions are
        # masked lane-rolls, and per-diagonal rescales are shared per
        # read block. Requires the log-space kernels.
        assert 1 <= P <= 4, "paths-in-lanes supports P <= 4"
        PP = {1: 1, 2: 2, 3: 4, 4: 4}[P]
        assert PP == 1 or log_space, "P>1 requires log_space=True"
        self.P, self.PP = P, PP
        self.log_space = log_space
        budget = float(os.environ.get("SIGNALALIGN_TPU_HBM_BUDGET", 13e9))
        nd_max = max(p.n_diag for p in problems)
        sb = stack_bytes(nd_max, W, S, T)
        if expect:
            sb += sb * 8 // 6   # 3-state f32 forward stack
        if self.estream:
            sb += sb * 4 // 6   # + f32 emission stream (WBe ~ WB)
        WBq = W + T + 128
        Dq = ((nd_max + T) // T + 1) * T
        NTq = Dq // T
        if PP > 1:
            # persistent legality planes: legf + legb
            sb += 2 * NTq * (2 * PP - 1) * WBq * S * 4
        if self.estream:
            # stream precompute inputs (kmer/mu/mhat windows + boundary
            # copies + per-diagonal event indices)
            sb += 3 * NTq * (WBq + 8) * S * 4 * 2 + Dq * S * 4
        if sb > budget:
            raise ValueError(
                f"DP stacks for n_diag={nd_max} W={W} S={S} exceed the "
                f"HBM budget ({budget:.2e}B)")
        self.problems = list(problems)
        self.W, self.T, self.S, self.RB = W, T, S, RB
        self.interpret = interpret
        B = len(problems)
        G = (B * PP + S - 1) // S
        self.G = G
        lane_list = [(pi, pp_) for pi in range(B) for pp_ in range(PP)]

        per = [tile_geometry(problems[pi], W, T, path=pp_)
               for (pi, pp_) in lane_list]
        WB = per[0][-1]
        self.WB = WB
        NT = per[0][0].shape[0]      # geom_t is (NT, T, NGEOM)
        Dp1p = NT * T
        self.Dp1p = Dp1p
        # per-diagonal manual DMA into the forward stack addresses the
        # array by a 32-bit byte offset: stacks past 4GB fault the TPU
        # worker (measured: W=512 expect, Dp1p 4080 = 4.76GB crashes;
        # Dp1p 1920 = 2.24GB and W=256 Dp1p 4800 = 3.71GB are fine).
        # Raise so dispatchers fall back to the XLA kernels / shorter
        # segment splits instead of crashing the device.
        fstack_b = Dp1p * (3 if expect else 1) * WB * S * 4
        if fstack_b > float(os.environ.get(
                "SIGNALALIGN_TPU_MAX_STACK_DMA", 4.2e9)):
            raise ValueError(
                f"forward-stack DMA offsets exceed 32 bits "
                f"(Dp1p={Dp1p}, WB={WB}: {fstack_b / 1e9:.2f}GB > 4GB); "
                f"split segments shorter")

        geom = np.zeros((G, NT, NGEOM, T, S), dtype=np.int32)
        refwin = np.zeros((G, NT, NREF, WB + 2, S), dtype=np.float32)
        evinit_f = np.zeros((G, NT, NEV, WB, S), dtype=np.float32)
        evinit_b = np.zeros((G, NT, NEV, WB, S), dtype=np.float32)
        evins_f = np.zeros((G, NT, NEV, T, S), dtype=np.float32)
        evins_b = np.zeros((G, NT, NEV, T, S), dtype=np.float32)
        pack = np.zeros((G, 16, S), dtype=np.float32)
        ev_off = np.zeros((G, S), dtype=np.float64)
        xoffs = np.zeros((G, Dp1p, S), dtype=np.int32)
        widths = np.zeros((G, Dp1p, S), dtype=np.int32)
        bases = np.zeros((G, Dp1p, S), dtype=np.int64)
        n_diag = np.zeros((G, S), dtype=np.int32)

        NLEG = 2 * PP - 1
        if PP > 1:
            from signalalign_tpu.ops.banded_fb_pallas import \
                tile_leg_windows
            legf = np.full((G, NT, NLEG, WB, S), bfb.NEG, dtype=np.float32)
            legb = np.full((G, NT, NLEG, WB, S), bfb.NEG, dtype=np.float32)

        for idx, ((pi, pp_), (g_, rw, ef, eb, eif, eib, base, _)) in \
                enumerate(zip(lane_list, per)):
            p = problems[pi]
            gi, si = divmod(idx, S)
            if PP > 1:
                lf, lb = tile_leg_windows(p, W, T, pp_, PP)
                legf[gi, :, :, :, si] = np.transpose(lf, (1, 0, 2))
                legb[gi, :, :, :, si] = np.transpose(lb, (1, 0, 2))
            gflat = g_.reshape(-1, NGEOM)
            geom[gi, :, :, :, si] = np.transpose(g_, (0, 2, 1))
            rwp = rw[:, :NREF, :].copy()
            if not log_space:
                # probability-space kernels take the emission log
                # constants pre-exponentiated (planes 2 = c_m, 4 = c_y)
                rwp[:, 2, :] = np.exp(rwp[:, 2, :])
                rwp[:, 4, :] = np.exp(rwp[:, 4, :])
            refwin[gi, :, :, :, si] = rwp
            evinit_f[gi, :, :, :, si] = ef
            evinit_b[gi, :, :, :, si] = eb
            evins_f[gi, :, :, :, si] = np.transpose(eif, (0, 2, 1))
            evins_b[gi, :, :, :, si] = np.transpose(eib, (0, 2, 1))
            pk16 = _pack16_log(p) if log_space else _pack16(p)
            if pp_ > 0:
                # only path 0 of cell (0, 0) carries start mass
                # (banded_fb f0[:, 0, 0]); non-zero path lanes start dead
                pk16 = pk16.copy()
                pk16[9:12] = bfb.NEG
            pack[gi, :, si] = pk16
            ev_off[gi, si] = 0.0 if log_space else p.ev_norm_total
            xoffs[gi, :, si] = gflat[:, G_XOFF]
            widths[gi, :, si] = gflat[:, G_WIDTH]
            bases[gi, :, si] = base
            n_diag[gi, si] = p.n_diag
            if (gflat[:, G_DK].max() * 128 > RB
                    or gflat[:, G_DKB].max() * 128 > RB):
                raise ValueError("tile re-base exceeds RB")

        import jax
        import jax.numpy as jnp

        # multi-chip dispatch: place every persistent array on the
        # target device; all downstream jits then execute there (the
        # runner round-robins stripes across jax.local_devices())
        self.device = device

        def _dev(a):
            x = jnp.asarray(a)
            return jax.device_put(x, device) if device is not None else x
        self.geom = _dev(geom)
        self.refwin = _dev(refwin)
        if self.estream:
            # the stream branch never reads the Gaussian event windows:
            # allocate zeros device-side instead of shipping ~100MB of
            # host arrays per stripe over the host link
            self.evinit_f = _dev(jnp.zeros(evinit_f.shape, jnp.float32))
            self.evinit_b = self.evinit_f
            self.evins_f = _dev(jnp.zeros(evins_f.shape, jnp.float32))
            self.evins_b = self.evins_f
        else:
            self.evinit_f = _dev(evinit_f)
            self.evinit_b = _dev(evinit_b)
            self.evins_f = _dev(evins_f)
            self.evins_b = _dev(evins_b)
        self.pack = _dev(pack)
        self.xoffs = _dev(xoffs)
        self.widths = _dev(widths)
        self.bases_h = bases
        self.ev_off = ev_off
        self.n_diag = _dev(n_diag)
        self.n_diag_h = n_diag
        # lane packing (ops/packing.py): per-lane segment tables for the
        # segment-aware totals scan + per-segment decode
        self.packed = problems[0].segments is not None
        assert all((p.segments is not None) == self.packed
                   for p in problems), "mixed packed/unpacked stripe"
        if self.packed:
            assert log_space, "lane packing requires the log-space kernels"
            SEGMAX = max(len(p.segments) for p in problems)
            self.SEGMAX = SEGMAX
            seg_s = np.zeros((G, SEGMAX, S), dtype=np.int32)
            seg_e = np.zeros((G, SEGMAX, S), dtype=np.int32)
            seg_v = np.zeros((G, SEGMAX, S), dtype=np.int32)
            for idx, (pi, pp_) in enumerate(lane_list):
                p = problems[pi]
                gi, si = divmod(idx, S)
                for k_, (_, _, _, d0, dend) in enumerate(p.segments):
                    seg_s[gi, k_, si] = d0
                    seg_e[gi, k_, si] = min(dend, Dp1p - 1)
                    seg_v[gi, k_, si] = 1
            self.seg_start = _dev(seg_s)
            self.seg_end = _dev(seg_e)
            self.seg_valid = _dev(seg_v)
        # per-tile lse flags: tile t of group g computes the forward
        # end-logsumexp only if some lane has a segment-final diagonal
        # in it
        lsef = np.zeros((G, NT), dtype=np.int32)
        for gi in range(G):
            for ti in np.unique(np.asarray(n_diag[gi]) // T):
                lsef[gi, min(int(ti), NT - 1)] = 1
        if self.packed:
            for p in problems:
                for (_, _, _, _, dend) in p.segments:
                    lsef[:, min(dend // T, NT - 1)] = 1
        self.lseflag = _dev(lsef)
        if self.estream:
            from signalalign_tpu.ops.emission_stream import \
                host_stream_inputs
            WBe = WB + 8
            LEmax = max(p.ev_params.shape[1] for p in problems)
            LXmax = max(p.kmer_ids.shape[1] for p in problems)
            kmerw = np.full((G, NT, WBe, S), -1, dtype=np.int32)
            aw = np.zeros((G, NT, WBe, S), dtype=np.float32)
            ivw = np.ones((G, NT, WBe, S), dtype=np.float32)
            evm = np.zeros((G, LEmax, S), dtype=np.float32)
            evv = np.zeros((G, LEmax, S), dtype=np.float32)
            j0d = np.zeros((G, Dp1p, S), dtype=np.int32)
            kidx = np.zeros((G, LXmax, S), dtype=np.int32)
            ivx = np.zeros((G, LXmax, S), dtype=np.float32)
            basex = np.zeros((G, NT, S), dtype=np.int32)
            for idx, (pi, pp_) in enumerate(lane_list):
                p = problems[pi]
                gi, si = divmod(idx, S)
                (kw, a_, iv_, em, ev_, j0, kx, ivx_, tb) = \
                    host_stream_inputs(p, W, T, pp_, WBe, LEmax)
                kmerw[gi, :, :, si] = kw
                aw[gi, :, :, si] = a_
                ivw[gi, :, :, si] = iv_
                evm[gi, :, si] = em
                evv[gi, :, si] = ev_
                j0d[gi, :, si] = j0
                kidx[gi, :len(kx), si] = kx
                ivx[gi, :len(ivx_), si] = ivx_
                basex[gi, :, si] = tb
            # banked spline-table DMA: distinct 128-aligned frame bases
            # per tile ("banks"); the eval kernel DMAs each bank's rows
            # once and selects per lane (emission_stream). Tiles with
            # more than 12 banks (pathological packs) fall back to the
            # XLA window path (maxb=0).
            MAXB = 1
            per_tile = []
            for gi in range(G):
                for tt in range(NT):
                    vals = np.unique(basex[gi, tt])
                    per_tile.append((gi, tt, vals))
                    MAXB = max(MAXB, len(vals))
            if MAXB <= 12:
                bmask = np.zeros((G, NT, MAXB, 8, S), dtype=np.float32)
                bslot = np.zeros((G, NT, MAXB, 8, 128), dtype=np.int32)
                bcnt = np.zeros((G, NT, 1, 8, 128), dtype=np.int32)
                for gi, tt, vals in per_tile:
                    bcnt[gi, tt] = len(vals)
                    for b, v in enumerate(vals):
                        bmask[gi, tt, b] = (basex[gi, tt] == v)[None, :]
                        bslot[gi, tt, b] = v // 8
                self.bank_maxb = MAXB
            else:
                bmask = np.zeros((G, NT, 1, 8, S), dtype=np.float32)
                bslot = np.zeros((G, NT, 1, 8, 128), dtype=np.int32)
                bcnt = np.zeros((G, NT, 1, 8, 128), dtype=np.int32)
                self.bank_maxb = 0
            self.stream_in = tuple(_dev(a) for a in (
                kmerw, aw, ivw, evm, evv, j0d, kidx, ivx, basex,
                bmask, bslot, bcnt))
            p0 = problems[0]
            self.hdp_dens = _dev(p0.hdp_dens)
            self.hdp_slopes = _dev(p0.hdp_slopes)
            self.hdp_grid = _dev(p0.hdp_grid)
            self.WBe = WBe
        self.legf = _dev(legf) if PP > 1 else None
        self.legb = _dev(legb) if PP > 1 else None
        if expect and self.estream:
            # HDP EM: no Gaussian moment accumulator (assignments come
            # from the compacted posterior pairs)
            self.num_kmers = 0
        if expect and not self.estream:
            # banked kmer-id tables for the device segment-sum (see
            # _kexp_reduce_banked): per-lane 128-granular tile-frame
            # banks + kmer ids by x-aligned accumulator slot (the TO
            # match cell x+1), and per-lane 1/var
            lane_tb = np.zeros((G, NT, S), dtype=np.int64)
            for idx, (pi, pp_) in enumerate(lane_list):
                p = problems[pi]
                gi, si = divmod(idx, S)
                Dp1 = p.x0.shape[0]
                x0f = np.zeros(Dp1p, dtype=np.int64)
                x0f[:Dp1] = p.x0
                x0f[Dp1:] = x0f[Dp1 - 1]
                lane_tb[gi, :, si] = (x0f[np.arange(NT) * T] // 128) * 128
            span = (lane_tb[:, -1] - lane_tb[:, 0]).max() if NT else 0
            XW = int(((span + WB + 127) // 128) * 128)
            bank = np.zeros((G, NT, S), dtype=np.int32)
            idx_by_x = np.full((G, XW, S), -1, dtype=np.int32)
            iv = np.ones((G, 1, S), dtype=np.float32)
            slot = np.arange(XW)
            for idx, (pi, pp_) in enumerate(lane_list):
                p = problems[pi]
                gi, si = divmod(idx, S)
                kids = p.kmer_ids[0].astype(np.int64)
                inv0 = p.ref_params[1, 0]
                LXp = kids.shape[0]
                tb0 = lane_tb[gi, 0, si]
                bank[gi, :, si] = (lane_tb[gi, :, si] - tb0) // 128
                xs = tb0 + slot + 1                       # TO cell x+1
                oob = (xs < 0) | (xs >= LXp)
                xc = np.clip(xs, 0, LXp - 1)
                kw_ = kids[xc].copy()
                kw_[oob] = -1
                kw_[inv0[xc] <= 0.0] = -1
                idx_by_x[gi, :, si] = kw_
                iv[gi, 0, si] = 1.0 / float(p.var)
            self.kexp_bank = _dev(bank)
            self.kexp_ids_x = _dev(idx_by_x)
            self.kexp_xw = XW
            self.ivar = _dev(iv)
            self.num_kmers = max(p.num_kmers for p in problems)
        self.NT = NT

    def _totals(self, f_incr, b_incr, f_lse, b_lse):
        """Per-diagonal cvec + totals: per lane, or per packed segment."""
        if self.packed:
            return _totals_cvec_df_seg(
                f_incr, b_incr, f_lse, b_lse, self.seg_start, self.seg_end,
                self.seg_valid, T=self.T, PP=self.PP, SEGMAX=self.SEGMAX)
        return _totals_cvec_df(f_incr, b_incr, f_lse, b_lse, self.n_diag,
                               T=self.T, PP=self.PP)

    def _totals_stack(self, tf_hi, tf_lo, tb_hi, tb_lo, counts, overflow,
                      nesc=None):
        """(6|7, G, S) stack, or for packed lanes a ((4, G, SEGMAX, S),
        (2|3, G, S)) pair — per-segment totals have an extra axis;
        ``nesc`` (delta-pair escape counts) rides as a trailing row."""
        rows = [counts.astype(jnp.float32), overflow.astype(jnp.float32)]
        if nesc is not None:
            rows.append(nesc.astype(jnp.float32))
        cnt = jnp.stack(rows)
        if self.packed:
            return (jnp.stack([tf_hi, tf_lo, tb_hi, tb_lo]), cnt)
        return jnp.concatenate(
            [jnp.stack([tf_hi, tf_lo, tb_hi, tb_lo]), cnt])

    def execute(self, compact_k: int = 4096, threshold: float = 0.01,
                as_arrays: bool = False, pack16: bool = False,
                delta_pairs: bool = False) -> List[Dict]:
        """Run the full pipeline and fetch results (blocking)."""
        return self.execute_async(compact_k, threshold, as_arrays, pack16,
                                  delta_pairs)()

    def execute_async(self, compact_k: int = 4096, threshold: float = 0.01,
                      as_arrays: bool = False, pack16: bool = False,
                      delta_pairs: bool = False):
        """Dispatch all device work; returns a zero-arg ``finish`` closure
        that fetches + decodes. Calling ``execute_async`` for the next
        batch BEFORE finishing the previous one overlaps the (dominant)
        device->host result transfer with the next batch's kernels.
        ``delta_pairs=True`` swaps the 4 B/pair fetch for the lossless
        2 B/pair delta stream (_delta_encode_pairs) — the production
        default on slow host links."""
        T, WB, S, RB = self.T, self.WB, self.S, self.RB
        estack = ebnd = None
        if self.estream:
            from signalalign_tpu.ops.emission_stream import \
                hdp_emission_stacks
            estack, ebnd = hdp_emission_stacks(
                *self.stream_in, self.hdp_dens, self.hdp_slopes,
                self.hdp_grid, T=T, WBe=self.WBe, maxb=self.bank_maxb,
                interpret=self.interpret)
        fstack, f_incr, f_lse = pallas_forward_b(
            self.geom, self.refwin, self.evinit_f, self.evins_f, self.pack,
            self.lseflag, self.legf, estack, WB=WB, T=T, S=S, RB=RB,
            interpret=self.interpret,
            log_space=self.log_space, PP=self.PP, estream=self.estream)
        # plain host float: a jnp scalar here cost a synchronous
        # ~45ms device fetch per dispatch when the rank path
        # re-read it as a static arg (float(log_thr))
        log_thr = float(np.log(max(threshold, 1e-300)))
        R = 5 if self.PP == 1 else 8
        # PP == 1 only: the paths-in-lanes posterior normalizer is the
        # BLOCK-JOINT total (logsumexp over a read's path lanes), which
        # the forward-only cvecf stream cannot express — P > 1 pair
        # decode keeps the separate compaction pass (production P > 1
        # calling runs the site-marginal path, not pair compaction)
        fusec = (self.log_space and not pack16 and self.PP == 1
                 and os.environ.get("SIGNALALIGN_TPU_NO_FUSE_COMPACT")
                 != "1")
        if fusec:
            # in-sweep survivor compaction (fuse_compact): the u16
            # posterior stack is never written or re-read — the
            # backward kernel consumes the forward normalizer stream
            # (the expectation path's) and emits rank slots directly
            cvecf = (_cvecf_expect_seg(f_incr, f_lse, self.seg_start,
                                       self.seg_end, self.seg_valid,
                                       T=T, SEGMAX=self.SEGMAX)
                     if self.packed else
                     _cvecf_expect(f_incr, f_lse, self.n_diag, T=T))
            b_incr, b_lse, slots, cnt = pallas_backward_b(
                self.geom, self.refwin, self.evinit_b, self.evins_b,
                self.pack, fstack, self.legb, estack, ebnd, cvecf,
                WB=WB, T=T, S=S, RB=RB, fuse_post=True,
                interpret=self.interpret, log_space=True,
                PP=self.PP, estream=self.estream,
                fuse_compact=True, rslot=R, log_thr=log_thr)
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(
                f_incr, b_incr, f_lse, b_lse)
            del fstack
            buf, counts, overflow = _compact_from_slots(
                slots, cnt, K=compact_k, R=R, WB=WB)
        else:
            postlog, b_incr, b_lse, fmax = pallas_backward_b(
                self.geom, self.refwin, self.evinit_b, self.evins_b,
                self.pack, fstack, self.legb, estack, ebnd,
                WB=WB, T=T, S=S, RB=RB, fuse_post=True,
                interpret=self.interpret, log_space=self.log_space,
                PP=self.PP, estream=self.estream)

            # normalization offsets + totals stay on device (compensated
            # f32 prefix at ~double precision); nothing but the packed
            # prefix and the (G, S) totals/counts cross the host link.
            # The per-diagonal fused-row max folds into the normalizer
            # (the stack rows are quantized relative to it).
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(
                f_incr, b_incr, f_lse, b_lse)
            cvec = cvec + fmax
            del fstack  # free the forward stack before compaction peaks
            C = max(T, 1)
            buf, counts, overflow = _compact_chunked(
                postlog, cvec, self.xoffs, self.widths, self.n_diag,
                log_thr, K=compact_k, C=C, pack16=pack16,
                interpret=self.interpret, R=R)
        nesc = None
        if delta_pairs and not pack16 and buf.shape[-1] == 4:
            bufA, bufB, nesc = _delta_encode_pairs(buf, counts)
            # pre-slice a conservative survivor prefix AT DISPATCH TIME
            # and start its D2H copy now: any device op issued at finish
            # time queues behind the next batch's kernels (FIFO) and
            # serializes the pipeline, and a blocking fetch costs a full
            # link round-trip. Survivors run ~1.1/event, so 1.6x lY
            # covers essentially always; the exact-slice path remains as
            # the overflow fallback.
            lYmax = max(p.lY for p in self.problems)
            kfix = min(max((int(1.5 * lYmax) + 127) // 128 * 128, 128),
                       compact_k)
            kefix = min(max(kfix // 32, 128), compact_k)
            G_, S_ = bufA.shape[:2]
            ab_pre = jnp.concatenate(
                [bufA[:, :, :kfix].reshape(G_, S_, 3 * kfix),
                 jax.lax.bitcast_convert_type(
                     bufB[:, :, :kefix],
                     jnp.uint8).reshape(G_, S_, 4 * kefix)], axis=2)
            try:
                ab_pre.copy_to_host_async()
            except Exception:
                pass
            buf = (bufA, bufB, ab_pre, kfix, kefix)
        # one small fetch: totals + counts + overflow together (counts
        # < 2^24 are exact in f32)
        totals = self._totals_stack(tf_hi, tf_lo, tb_hi, tb_lo, counts,
                                    overflow, nesc)
        # start the tiny totals D2H as soon as the device reaches it:
        # its ~45ms tunnel round-trip then overlaps the remaining queue
        # instead of serializing inside finish()
        try:
            for t_ in (totals if isinstance(totals, tuple) else (totals,)):
                t_.copy_to_host_async()
        except Exception:
            pass

        def finish():
            (total_f, total_b, counts_h, overflow_h, p_h,
             cell_h) = self._fetch_packed(totals, buf, compact_k, pack16)
            return self._decode_packed(p_h, cell_h, counts_h,
                                       total_f, total_b, as_arrays,
                                       overflow_h)
        return finish

    def execute_device_only(self, compact_k: int = 4096,
                            threshold: float = 0.01):
        """Full device pipeline (sweeps + reductions + compaction) with only
        the tiny totals/counts arrays fetched — measures device compute
        throughput with the result transfer excluded (the multi-chip /
        attached-host projection, where the PCIe link replaces the tunnel).
        Returns a zero-arg closure yielding (total_f (G,S), counts (G,S))."""
        T, WB, S, RB = self.T, self.WB, self.S, self.RB
        estack = ebnd = None
        if self.estream:
            from signalalign_tpu.ops.emission_stream import \
                hdp_emission_stacks
            estack, ebnd = hdp_emission_stacks(
                *self.stream_in, self.hdp_dens, self.hdp_slopes,
                self.hdp_grid, T=T, WBe=self.WBe, maxb=self.bank_maxb,
                interpret=self.interpret)
        fstack, f_incr, f_lse = pallas_forward_b(
            self.geom, self.refwin, self.evinit_f, self.evins_f, self.pack,
            self.lseflag, self.legf, estack, WB=WB, T=T, S=S, RB=RB,
            interpret=self.interpret,
            log_space=self.log_space, PP=self.PP, estream=self.estream)
        # plain host float: a jnp scalar here cost a synchronous
        # ~45ms device fetch per dispatch when the rank path
        # re-read it as a static arg (float(log_thr))
        log_thr = float(np.log(max(threshold, 1e-300)))
        R = 5 if self.PP == 1 else 8
        fusec = (self.log_space and self.PP == 1
                 and os.environ.get("SIGNALALIGN_TPU_NO_FUSE_COMPACT")
                 != "1")
        if fusec:
            cvecf = (_cvecf_expect_seg(f_incr, f_lse, self.seg_start,
                                       self.seg_end, self.seg_valid,
                                       T=T, SEGMAX=self.SEGMAX)
                     if self.packed else
                     _cvecf_expect(f_incr, f_lse, self.n_diag, T=T))
            b_incr, b_lse, slots, cnt = pallas_backward_b(
                self.geom, self.refwin, self.evinit_b, self.evins_b,
                self.pack, fstack, self.legb, estack, ebnd, cvecf,
                WB=WB, T=T, S=S, RB=RB, fuse_post=True,
                interpret=self.interpret, log_space=True,
                PP=self.PP, estream=self.estream,
                fuse_compact=True, rslot=R, log_thr=log_thr)
            _, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(
                f_incr, b_incr, f_lse, b_lse)
            del fstack
            _, counts, _ = _compact_from_slots(slots, cnt, K=compact_k,
                                               R=R, WB=WB)
        else:
            postlog, b_incr, b_lse, fmax = pallas_backward_b(
                self.geom, self.refwin, self.evinit_b, self.evins_b,
                self.pack, fstack, self.legb, estack, ebnd,
                WB=WB, T=T, S=S, RB=RB, fuse_post=True,
                interpret=self.interpret, log_space=self.log_space,
                PP=self.PP, estream=self.estream)
            cvec, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(
                f_incr, b_incr, f_lse, b_lse)
            cvec = cvec + fmax
            del fstack
            _, counts, _ = _compact_chunked(postlog, cvec, self.xoffs,
                                            self.widths, self.n_diag,
                                            log_thr, K=compact_k,
                                            C=max(T, 1),
                                            interpret=self.interpret,
                                            R=R)
        totals = jnp.stack([tf_hi, tf_lo])

        def finish():
            th = np.asarray(totals, dtype=np.float64)
            off = 0.0 if self.packed else self.ev_off
            return th[0] + th[1] + off, np.asarray(counts)
        # the tiny result arrays, exposed so callers can block on device
        # completion without paying a host round-trip per dispatch (the
        # tunnel RTT here is ~45ms; PCIe-attached production hosts pay
        # microseconds) — see bench.run_compute
        finish.device_arrays = (totals, counts)
        return finish

    def execute_site_marginals(self, sites, threshold: float = 0.01,
                               fetch_u8: bool = False):
        """Variant/methylation fast path: per-site posterior sums
        computed ON DEVICE (_site_marginals) — only (n_sites, lanes)
        tables + totals cross the host link, instead of the per-pair
        stream. ``fetch_u8`` (default) normalizes each read's site
        across its path lanes ON DEVICE and ships u8 fractions
        (1 B/site/path ~ 0.2-0.7 B/event at CpG density; the caller
        renormalizes per site so only the 1/255 fraction quantization
        remains, far inside calling tolerances); f16 raw sums
        otherwise.

        ``sites``: per decode-result entry (per segment for packed
        lanes), a sequence of 1-based cell x positions whose k-mers
        report at an ambiguous site (the caller's site cells). Returns a
        finish closure -> list of dicts (decode order) with
        ``site_probs`` (P, n_sites) posterior sums (threshold-masked
        like the pair stream) + totals/numerics flags.
        """
        T, WB, S, RB = self.T, self.WB, self.S, self.RB
        PP = self.PP
        B = len(self.problems)
        # entry list mirrors the decode order
        if self.packed:
            entries = [(pi, k_) for pi in range(B)
                       for k_ in range(len(self.problems[pi].segments))]
        else:
            entries = [(pi, 0) for pi in range(B)]
        assert len(sites) == len(entries), \
            f"need one site list per result entry ({len(entries)})"
        # segments sharing a packed lane stack their sites at
        # CUMULATIVE slot offsets (one slot row per site per lane; a
        # per-entry [:len(xs)] write would clobber earlier segments)
        lane_off = [0] * len(self.problems)
        ent_lane = []
        for ei, (pi, k_) in enumerate(entries):
            ent_lane.append((pi * PP, lane_off[pi], len(sites[ei])))
            lane_off[pi] += len(sites[ei])
        NS = max(lane_off + [1])
        G, NT = self.G, self.NT
        bank = np.zeros((G, NT, S), dtype=np.int32)
        tb0 = self.bases_h[:, 0, :]
        for t in range(NT):
            bank[:, t, :] = (self.bases_h[:, t * T, :] - tb0) // 128
        span = int((self.bases_h[:, -1, :] - tb0).max()) if NT else 0
        XW = int(((span + WB + 127) // 128) * 128)
        site_slot = np.full((G, NS, S), -1, dtype=np.int32)
        for ei, (pi, k_) in enumerate(entries):
            p = self.problems[pi]
            ox = p.segments[k_][1] if self.packed else 0
            xs = np.asarray(sites[ei], dtype=np.int64)
            base = ent_lane[ei][1]
            for j in range(PP):
                idx = pi * PP + j
                gi, si = divmod(idx, S)
                if len(xs):
                    site_slot[gi, base:base + len(xs), si] = \
                        (xs + ox - tb0[gi, si]).astype(np.int32)

        estack = ebnd = None
        if self.estream:
            from signalalign_tpu.ops.emission_stream import \
                hdp_emission_stacks
            estack, ebnd = hdp_emission_stacks(
                *self.stream_in, self.hdp_dens, self.hdp_slopes,
                self.hdp_grid, T=T, WBe=self.WBe, maxb=self.bank_maxb,
                interpret=self.interpret)
        fstack, f_incr, f_lse = pallas_forward_b(
            self.geom, self.refwin, self.evinit_f, self.evins_f, self.pack,
            self.lseflag, self.legf, estack, WB=WB, T=T, S=S, RB=RB,
            interpret=self.interpret,
            log_space=self.log_space, PP=PP, estream=self.estream)
        postlog, b_incr, b_lse, fmax = pallas_backward_b(
            self.geom, self.refwin, self.evinit_b, self.evins_b, self.pack,
            fstack, self.legb, estack, ebnd, WB=WB, T=T, S=S, RB=RB,
            fuse_post=True, interpret=self.interpret,
            log_space=self.log_space, PP=PP, estream=self.estream)
        cvec, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(f_incr, b_incr,
                                                        f_lse, b_lse)
        cvec = cvec + fmax
        del fstack
        log_thr = float(np.log(max(threshold, 1e-300)))
        marg = _site_marginals(
            postlog, cvec, self.n_diag, jnp.asarray(bank),
            jnp.asarray(site_slot), T=T, XW=XW, log_thr=log_thr)
        if fetch_u8:
            # normalize each site across its read's PP path lanes on
            # device and fetch u8 fractions: the calling fold
            # renormalizes per site, so only the 1/255 quantization
            # remains (< 1 B/site/path on the link)
            mb = marg.reshape(marg.shape[0], marg.shape[1], S // PP, PP)
            tot = jnp.maximum(jnp.sum(mb, axis=3, keepdims=True), 1e-12)
            marg = jnp.round(mb / tot * 255.0).astype(jnp.uint8).reshape(
                marg.shape)
        else:
            # f16 raw sums: O(events/site) magnitudes with ~5e-4
            # relative error — far inside calling tolerances
            marg = marg.astype(jnp.float16)
        totals = self._totals_stack(tf_hi, tf_lo, tb_hi, tb_lo,
                                    jnp.zeros_like(tf_hi[..., 0, :]
                                                   if self.packed
                                                   else tf_hi),
                                    jnp.zeros_like(tf_hi[..., 0, :]
                                                   if self.packed
                                                   else tf_hi))
        try:
            marg.copy_to_host_async()
            for t_ in (totals if isinstance(totals, tuple) else (totals,)):
                t_.copy_to_host_async()
        except Exception:
            pass

        def finish():
            (total_f, total_b, _c, _o, _n) = self._fetch_totals(totals)
            mh = np.asarray(marg, dtype=np.float64)
            out = []
            for ei, ((pi, k_), (lane0, base, nx)) in enumerate(
                    zip(entries, ent_lane)):
                probs = np.zeros((PP, nx))
                for j in range(PP):
                    gi, si = divmod(lane0 + j, S)
                    probs[j] = mh[gi, base:base + nx, si]
                if self.packed:
                    tf = total_f[divmod(lane0, S)[0], k_,
                                 divmod(lane0, S)[1]]
                    tb = total_b[divmod(lane0, S)[0], k_,
                                 divmod(lane0, S)[1]]
                else:
                    gi, si = divmod(lane0, S)
                    tf, tb = total_f[gi, si], total_b[gi, si]
                out.append({"site_probs": probs,
                            "total_f": float(tf), "total_b": float(tb)})
            return out
        finish.device_arrays = ((marg,)
                                + (totals if isinstance(totals, tuple)
                                   else (totals,)))
        return finish

    def _fetch_totals(self, totals):
        """-> (total_f, total_b, counts, overflow, nesc); totals have a
        SEGMAX axis for packed lanes ((G, SEGMAX, S)) and are per-lane
        (G, S) otherwise; nesc is None unless the delta-pair stream is
        active."""
        if isinstance(totals, tuple):
            seg_tot, cnt = totals
            th = np.asarray(seg_tot, dtype=np.float64)
            ch = np.asarray(cnt, dtype=np.float64)
            nesc = ch[2].astype(np.int64) if ch.shape[0] > 2 else None
            return (th[0] + th[1], th[2] + th[3],
                    ch[0].astype(np.int64), ch[1] > 0.5, nesc)
        th = np.asarray(totals, dtype=np.float64)
        nesc = th[6].astype(np.int64) if th.shape[0] > 6 else None
        # kernels run on event-normalized emissions; restore the
        # per-problem normalizer in the reported totals
        return (th[0] + th[1] + self.ev_off, th[2] + th[3] + self.ev_off,
                th[4].astype(np.int64), th[5] > 0.5, nesc)

    def _fetch_packed(self, totals, buf, compact_k, pack16=False):
        """Fetch the totals stack + the counts-bounded packed prefix and
        unpack to (total_f, total_b, counts, overflow, p, cell) — shared
        by the inference and expectation finish paths. ``buf`` is the
        4|5|6 B/pair direct buffer, or an (A, B) delta-stream pair
        (2 B/pair + escaped absolutes; see _delta_encode_pairs)."""
        (total_f, total_b, counts_h, overflow_h,
         nesc_h) = self._fetch_totals(totals)
        # fetch only the (128-granular) K-prefix that holds survivors:
        # the compaction sorted them to the front. This is the single
        # biggest transfer of the pipeline.
        kmax = int(counts_h.max()) if counts_h.size else 0
        kf = min(max((kmax + 127) // 128 * 128, 128), compact_k)
        if isinstance(buf, tuple):
            bufA, bufB, ab_pre, kfix, kefix = buf
            G_, S_ = bufA.shape[:2]
            ne = int(nesc_h.max()) if nesc_h is not None and nesc_h.size \
                else 0
            if kmax <= kfix and ne <= kefix:
                # fast path: the dispatch-time prefix (already streaming
                # to the host) covers every lane — no finish-time device
                # work, no extra round-trip
                abh = np.asarray(ab_pre)
                a_h = abh[:, :, :3 * kfix].reshape(G_, S_, kfix, 3)
                b_h = abh[:, :, 3 * kfix:].copy().view(np.uint32)
            else:
                ke = min(max((ne + 127) // 128 * 128, 128), compact_k) \
                    if ne else 0
                parts = [bufA[:, :, :kf].reshape(G_, S_, 3 * kf)]
                if ke:
                    parts.append(jax.lax.bitcast_convert_type(
                        bufB[:, :, :ke],
                        jnp.uint8).reshape(G_, S_, 4 * ke))
                abh = np.asarray(jnp.concatenate(parts, axis=2)
                                 if len(parts) > 1 else parts[0])
                a_h = abh[:, :, :3 * kf].reshape(G_, S_, kf, 3)
                b_h = (abh[:, :, 3 * kf:].copy().view(np.uint32)
                       if ke else np.zeros((G_, S_, 0), np.uint32))
            p_h, cell_h = _delta_decode_pairs(
                a_h, b_h, counts_h,
                nesc_h if nesc_h is not None else np.zeros_like(counts_h))
            return total_f, total_b, counts_h, overflow_h, p_h, cell_h
        bh = np.asarray(buf[:, :, :kf] if kf < compact_k else buf)
        if pack16:
            p_h = (bh[..., 0:2].copy().view(np.uint16)[..., 0]
                   .astype(np.float64) / 65535.0)
            cb = bh[..., 2:]
        else:
            p_h = bh[..., 0].astype(np.float64) / 255.0
            cb = bh[..., 1:]
        if cb.shape[-1] == 3:
            cell_h = (cb[..., 0:2].copy().view(np.uint16)[..., 0]
                      .astype(np.uint32)
                      | (cb[..., 2].astype(np.uint32) << 16))
        else:
            cell_h = cb[..., 0:4].copy().view(np.uint32)[..., 0]
        return total_f, total_b, counts_h, overflow_h, p_h, cell_h

    def execute_expect(self, compact_k: int = 4096,
                       threshold: float = 0.01,
                       fetch_pairs: bool = True,
                       host_async: bool = True):
        """EM expectation pass on the lane kernels: one fwd+bwd sweep
        pair returns aligned pairs AND the (3,3) transition posterior
        sums + per-kmer emission moments, accumulated in the backward
        kernel (banded_fb._expectations_core semantics) instead of the
        XLA re-scan. P=1, Gaussian MEAN_ONLY or HDP (threeStateHdp EM:
        transitions ride in-kernel, kexp is zeros — HDP emissions train
        via Gibbs on the thresholded assignment pairs this same pass
        compacts). Returns a finish closure -> List[dict] with
        pairs/totals/texp/kexp.

        ``fetch_pairs=False`` skips the packed-prefix transfer and the
        pair decode (results carry empty ``pairs``): transition-only EM
        iterations need just texp/kexp/totals, and on slow device links
        the pair prefix is the dominant transfer."""
        assert self.expect
        T, WB, S, RB = self.T, self.WB, self.S, self.RB
        estack = ebnd = None
        if self.estream:
            from signalalign_tpu.ops.emission_stream import \
                hdp_emission_stacks
            estack, ebnd = hdp_emission_stacks(
                *self.stream_in, self.hdp_dens, self.hdp_slopes,
                self.hdp_grid, T=T, WBe=self.WBe, maxb=self.bank_maxb,
                interpret=self.interpret)
        fstack, f_incr, f_lse = pallas_forward_b(
            self.geom, self.refwin, self.evinit_f, self.evins_f, self.pack,
            self.lseflag, None, estack, WB=WB, T=T, S=S, RB=RB,
            interpret=self.interpret, log_space=True,
            estream=self.estream, expect=True)
        if self.packed:
            cvecf = _cvecf_expect_seg(f_incr, f_lse, self.seg_start,
                                      self.seg_end, self.seg_valid, T=T,
                                      SEGMAX=self.SEGMAX)
        else:
            cvecf = _cvecf_expect(f_incr, f_lse, self.n_diag, T=T)
        bouts = pallas_backward_b(
            self.geom, self.refwin, self.evinit_b, self.evins_b, self.pack,
            fstack, None, estack, ebnd, cvecf,
            None if self.estream else self.ivar,
            WB=WB, T=T, S=S, RB=RB, fuse_post=True,
            interpret=self.interpret, log_space=True,
            estream=self.estream, expect=True)
        if self.estream:
            postlog, b_incr, b_lse, fmax, texp8 = bouts
            kexp_t = None
        else:
            postlog, b_incr, b_lse, fmax, texp8, kexp_t = bouts
        cvec, tf_hi, tf_lo, tb_hi, tb_lo = self._totals(f_incr, b_incr,
                                                        f_lse, b_lse)
        cvec = cvec + fmax
        del fstack
        if kexp_t is None:
            kexp_dev = jnp.zeros((self.G, S, 3, 1), jnp.float32)
        else:
            kexp_dev = _kexp_reduce_banked(kexp_t, self.kexp_bank,
                                           self.kexp_ids_x,
                                           K=self.num_kmers,
                                           XW=self.kexp_xw)
            del kexp_t
        # plain host float: a jnp scalar here cost a synchronous
        # ~45ms device fetch per dispatch when the rank path
        # re-read it as a static arg (float(log_thr))
        log_thr = float(np.log(max(threshold, 1e-300)))
        buf, counts, overflow = _compact_chunked(
            postlog, cvec, self.xoffs, self.widths, self.n_diag, log_thr,
            K=compact_k, C=max(T, 1), interpret=self.interpret,
            R=5 if self.PP == 1 else 8)
        totals = self._totals_stack(tf_hi, tf_lo, tb_hi, tb_lo, counts,
                                    overflow)
        try:
            # overlap the D2H transfers with the remaining device queue;
            # callers measuring pure device throughput (bench) pass
            # host_async=False so the (multi-MB kexp) copies don't ride
            # the link inside their timed region
            if host_async:
                for t_ in (totals if isinstance(totals, tuple)
                           else (totals,)):
                    t_.copy_to_host_async()
                texp8.copy_to_host_async()
                kexp_dev.copy_to_host_async()
        except Exception:
            pass

        def finish():
            if fetch_pairs:
                (total_f, total_b, counts_h, overflow_h, p_h,
                 cell_h) = self._fetch_packed(totals, buf, compact_k)
            else:
                total_f, total_b, counts_h, overflow_h, _ = \
                    self._fetch_totals(totals)
                counts_h = np.zeros(counts_h.shape, dtype=np.int64)
                p_h = np.zeros(counts_h.shape + (0,))
                cell_h = np.zeros(counts_h.shape + (0,), dtype=np.uint32)
            texp_h = np.asarray(texp8, dtype=np.float64)
            kexp_h = np.asarray(kexp_dev, dtype=np.float64)
            results = self._decode_packed(p_h, cell_h, counts_h,
                                          total_f, total_b, False,
                                          overflow_h)
            # texp rows: (mx, xx, mm, xm, ym, my, yy)
            rows = ((0, 1), (1, 1), (0, 0), (1, 0), (2, 0), (0, 2),
                    (2, 2))
            # packed lanes accumulate expectations across their whole
            # lane; attribute the lane's sums to its FIRST segment's
            # result (EM consumes global sums — zero-filling the other
            # segments keeps them exact)
            seen_lanes = set()
            for idx, r in enumerate(results):
                if self.packed:
                    gi, si = self._result_lanes[idx]
                    first = (gi, si) not in seen_lanes
                    seen_lanes.add((gi, si))
                else:
                    gi, si = divmod(idx, S)
                    first = True
                te = np.zeros((3, 3))
                if first:
                    for r_, (a, b) in enumerate(rows):
                        te[a, b] = texp_h[gi, r_, si]
                r["texp"] = te
                r["kexp"] = (kexp_h[gi, si] if first
                             else np.zeros_like(kexp_h[gi, si]))  # (3, K)
            return results
        finish.device_arrays = (
            (totals if isinstance(totals, tuple) else (totals,))
            + (texp8, kexp_dev))
        return finish

    def _decode_lane_packed(self, p_h, cell_h, counts_h, total_f, total_b,
                            as_arrays, overflow_h):
        """Decode for lane-packed problems: one result entry per
        (problem, segment), in segment order — callers re-associate via
        the pack groups. Totals carry a SEGMAX axis (G, SEGMAX, S);
        pairs split by each segment's diagonal range and shift back to
        the segment's local (x, y) frame."""
        S, WB, PP = self.S, self.WB, self.PP
        results = []
        self._result_lanes = []

        def _lse_h(vals):
            v = np.asarray(vals, dtype=np.float64)
            v = v[np.isfinite(v)]
            if v.size == 0:
                return float("-inf")
            m = v.max()
            return float(m + np.log(np.exp(v - m).sum()))

        for pi, p in enumerate(self.problems):
            lanes = [divmod(pi * PP + j, S) for j in range(PP)]
            # per-lane decoded arrays once, then split per segment by
            # searchsorted on the (sorted) diagonal — no per-segment
            # boolean masks over the whole lane
            lane_cells = []
            for (gi, si) in lanes:
                n = min(int(counts_h[gi, si]), p_h.shape[2])
                pk = p_h[gi, si, :n]
                c = cell_h[gi, si, :n]
                d = (c // WB).astype(np.int64)
                wb = (c % WB).astype(np.int64)
                x = self.bases_h[gi, d, si] + wb
                lane_cells.append((pk, d, x))
            seg_slices = []
            for (orig, ox, oy, d0, dend) in p.segments:
                sl_ = []
                for (pk, d, x) in lane_cells:
                    lo = np.searchsorted(d, d0, side="left")
                    hi = np.searchsorted(d, dend, side="right")
                    sl_.append((lo, hi))
                seg_slices.append(sl_)
            for k_, (orig, ox, oy, d0, dend) in enumerate(p.segments):
                tf = _lse_h([total_f[gi, k_, si] for gi, si in lanes])
                tb = _lse_h([total_b[gi, k_, si] for gi, si in lanes])
                over = any(bool(overflow_h[gi, si]) for gi, si in lanes) \
                    if overflow_h is not None else False
                entry = {"total_f": tf, "total_b": tb,
                         "numerics_suspect": (not abs(tf - tb) < 1.0)
                         or over}
                if PP > 1:
                    pairs = []
                    for j, (pk, d, x) in enumerate(lane_cells):
                        lo, hi = seg_slices[k_][j]
                        xs = x[lo:hi] - ox
                        ys = (d[lo:hi] - x[lo:hi]) - oy
                        pks = pk[lo:hi]
                        ok = (xs > 0) & (ys > 0) & (xs <= orig.lX) \
                            & (ys <= orig.lY)
                        for pr, xi, yi in zip(pks[ok], xs[ok], ys[ok]):
                            kmer = orig.path_kmer_at(int(xi), j)
                            if kmer is None:
                                continue
                            pairs.append((int(pr * 10000000), int(xi) - 1,
                                          int(yi) - 1, kmer))
                    pairs.sort(key=lambda r: (r[1] + r[2], r[1]))
                    entry["pairs"] = pairs
                    if as_arrays:
                        raise ValueError("as_arrays unsupported for P > 1")
                else:
                    pk, d, x = lane_cells[0]
                    lo, hi = seg_slices[k_][0]
                    xs = x[lo:hi] - ox
                    ys = (d[lo:hi] - x[lo:hi]) - oy
                    pks = pk[lo:hi]
                    ok = (xs > 0) & (ys > 0) & (xs <= orig.lX) \
                        & (ys <= orig.lY)
                    arrs = ((pks[ok] * 10000000).astype(np.int64),
                            xs[ok] - 1, ys[ok] - 1)
                    if as_arrays:
                        entry["pairs_arrays"] = arrs
                    else:
                        kk = orig.kmer_len
                        seq = orig.seq
                        entry["pairs"] = [
                            (int(pr), int(xi), int(yi),
                             seq[xi:xi + kk])
                            for pr, xi, yi in zip(*arrs)]
                results.append(entry)
                self._result_lanes.append(lanes[0])
        return results

    def _decode_packed(self, p_h, cell_h, counts_h, total_f, total_b,
                       as_arrays, overflow_h=None):
        # survivors arrive pre-filtered (device f32 threshold), pre-sorted
        # by (diagonal, band offset) == the (x+y, x) output order, and
        # prefix-packed: decode is pure slicing, no host sort/filter
        S, WB, PP = self.S, self.WB, self.PP

        if self.packed:
            return self._decode_lane_packed(p_h, cell_h, counts_h,
                                            total_f, total_b, as_arrays,
                                            overflow_h)

        def lane_arrays(p, gi, si):
            n = min(int(counts_h[gi, si]), p_h.shape[2])
            pk = p_h[gi, si, :n]
            c = cell_h[gi, si, :n]
            d = (c // WB).astype(np.int64)
            wb = (c % WB).astype(np.int64)
            x = self.bases_h[gi, d, si] + wb
            y = d - x
            ok = (x > 0) & (y > 0) & (x <= p.lX) & (y <= p.lY)
            return ((pk[ok] * 10000000).astype(np.int64),
                    x[ok] - 1, y[ok] - 1)

        results = []
        if PP > 1:
            # merge each problem's PP path-lanes: joint totals are the
            # logsumexp over paths (the DP is joint; per-path-lane
            # forward/backward totals condition on different endpoints
            # and only agree after the path reduce). Dead padding lanes
            # can carry -inf/NaN totals - drop them.
            def _lse_h(vals):
                v = np.asarray(vals, dtype=np.float64)
                v = v[np.isfinite(v)]
                if v.size == 0:
                    return float("-inf")
                m = v.max()
                return float(m + np.log(np.exp(v - m).sum()))

            for pi, p in enumerate(self.problems):
                gis = [divmod(pi * PP + j, S) for j in range(PP)]
                tf = _lse_h([total_f[gi, si] for gi, si in gis])
                tb = _lse_h([total_b[gi, si] for gi, si in gis])
                over = any(bool(overflow_h[gi, si]) for gi, si in gis) \
                    if overflow_h is not None else False
                pairs = []
                for j, (gi, si) in enumerate(gis):
                    pk, xs, ys = lane_arrays(p, gi, si)
                    for pr, xi, yi in zip(pk, xs, ys):
                        kmer = p.path_kmer_at(int(xi) + 1, j)
                        if kmer is None:
                            continue
                        pairs.append((int(pr), int(xi), int(yi), kmer))
                pairs.sort(key=lambda r: (r[1] + r[2], r[1]))
                entry = {"total_f": float(tf), "total_b": float(tb),
                         "numerics_suspect":
                             (not abs(float(tf) - float(tb)) < 1.0)
                             or over,
                         "pairs": pairs}
                if as_arrays:
                    raise ValueError("as_arrays unsupported for P > 1")
                results.append(entry)
            return results

        for idx, p in enumerate(self.problems):
            gi, si = divmod(idx, S)
            arrs = lane_arrays(p, gi, si)
            entry = {"total_f": float(total_f[gi, si]),
                     "total_b": float(total_b[gi, si]),
                     # forward/backward totals must agree; a gap means the
                     # probability-space DP truncated this lane (deep
                     # within-band dynamic range, e.g. wide bulge bands).
                     # A rank-compaction overflow (>R survivors on one
                     # diagonal) likewise leaves the prefix incomplete.
                     # Callers re-run such segments on an exact path.
                     "numerics_suspect": (not (
                         abs(float(total_f[gi, si])
                             - float(total_b[gi, si])) < 1.0))
                     or bool(overflow_h is not None
                             and overflow_h[gi, si])}
            if as_arrays:
                entry["pairs_arrays"] = arrs
            else:
                k = p.kmer_len
                seq = p.seq
                entry["pairs"] = [
                    (int(pr), int(xi), int(yi), seq[xi:xi + k])
                    for pr, xi, yi in zip(*arrs)]
            results.append(entry)
        return results
