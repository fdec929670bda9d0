"""Fused Pallas TPU wavefront kernels for the banded forward-backward.

The XLA lax.scan implementation (banded_fb.py) issues ~40 small kernels per
anti-diagonal; at 2x65k diagonals per read batch the per-op dispatch alone
costs seconds. These kernels run T diagonals per kernel invocation with the
DP carries resident in VMEM scratch, so per-diagonal cost is pure VPU work.

Key layout decision — the **x-frame**: lanes index absolute reference
positions (relative to a per-tile 128-aligned base), not band offsets.
Consequences (matching Mosaic's lane-alignment constraints, which forbid
data-dependent unaligned lane slices):

  * neighbor reads between anti-diagonals are FIXED static -1/0/+1 lane
    slices (cells (x-1, y), (x-1, y-1), (x, y-1) sit at lanes l-1, l-1, l);
  * reference emission parameters for a tile are a host-gathered blocked
    input (B, NT, NREF, WB+8) loaded whole per tile — no per-step slicing;
  * the event window (y = d - x varies along the diagonal) shifts by
    exactly one lane per diagonal, maintained incrementally with one
    scalar insert per step; per-tile re-init rows are host-gathered;
  * the band is applied as a per-diagonal lane mask [xoff, xoff+width);
  * at tile boundaries the ring re-bases by a multiple of 128 lanes,
    selected among static (aligned) slices.

Feasibility rests on the band origin moving at most one cell per diagonal
(guaranteed by the reference band geometry; checked host-side).

Per-diagonal max-rescaling (float32 accuracy) and the normalized-stack +
offset-increment output contract are identical to
banded_fb._banded_sweeps_core, which is validated against the float64
oracle and the upstream golden TSVs.

P=1 canonical sequences, MODE_MEAN_ONLY emissions (the production
signalMachine path); other modes use the XLA kernels.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from signalalign_tpu.ops import banded_fb as bfb
from signalalign_tpu.ops.banded_fb import (GAP_X, GAP_Y, MATCH, NEG, T_MM,
                                           T_MX, T_MY, T_XM, T_XX, T_YM,
                                           T_YY)

NGEOM = 8
G_XOFF, G_WIDTH, G_JINS, G_DK, G_ISEND, G_JINSB, G_DKB, G_ISSTART = range(8)
PACK_TRANS = 0
PACK_START = 9
PACK_END = 12
PACK_GAPX = 15
NPACK = 16
NREF = 5   # m_hat, inv_m, c_m, inv_y, c_y
NEV = 3    # mean, valid, best-case log-emission offset (prob kernels)
REBASE_MAX = 512          # max ring re-base in lanes (4 tiles of 128)
RBASE = 8 + REBASE_MAX    # ring data column origin
EBASE = 8                 # event window data column origin


def tile_geometry(problem: bfb.BandedProblem, W: int, T: int,
                  path: int = 0):
    """Host-side per-tile/per-diagonal geometry for the x-frame kernels.

    ``path`` selects the k-mer parameter row for one expansion path of a
    P>1 (degenerate-base) problem; invalid path slots carry zeroed
    parameters (inv_m == 0) and self-mask in the kernels."""
    Dp1 = problem.x0.shape[0]
    Dp1p = ((Dp1 + T - 1) // T) * T
    NT = Dp1p // T
    WB = W + T + 128
    lY = problem.lY
    fp = problem.ev_front_pad

    x0 = np.zeros(Dp1p, dtype=np.int64)
    width = np.zeros(Dp1p, dtype=np.int64)
    x0[:Dp1] = problem.x0
    x0[Dp1:] = x0[Dp1 - 1]
    width[:Dp1] = problem.width

    d = np.arange(Dp1p)
    tile = d // T
    tile_k = x0[tile * T] // 128
    base = tile_k * 128
    xoff = x0 - base
    if xoff.min() < 0 or (xoff + width).max() > WB:
        raise ValueError("x-frame tile feasibility violated (band moved "
                         "faster than one cell per diagonal?)")

    pslot = min(path, problem.ref_params.shape[1] - 1)
    ref1 = problem.ref_params[:NREF, pslot, :]   # (NREF, LXpad)
    if path >= problem.ref_params.shape[1]:
        ref1 = np.zeros_like(ref1)               # padding lane: all-invalid
    LX = ref1.shape[-1]
    ev_mean = problem.ev_params[0]
    ev_valid = problem.ev_params[3]
    ev_cbest = (problem.ev_best if problem.ev_best is not None
                else np.zeros_like(ev_mean))
    LE = ev_mean.shape[-1]

    lanes8 = np.arange(WB + 2)
    tb = base[::T]                                   # (NT,)
    ref_idx = np.clip(tb[:, None] + lanes8[None, :], 0, LX - 1)
    oob = (tb[:, None] + lanes8[None, :]) >= LX
    refwin = ref1[:, ref_idx]                        # (NREF, NT, WB+2)
    refwin = np.ascontiguousarray(np.transpose(refwin, (1, 0, 2)))
    inv_row = refwin[:, 1, :]
    inv_row[oob] = 0.0                               # inv_m=0 marks invalid

    # event j index at lane l on diagonal d: j(d, l) = lY - d + fp + base + l
    j0 = lY - d + fp + base
    jins = np.clip(j0, 0, LE - 1)                    # scalar entering lane 0
    j0b = j0 - 1                                     # backward: event y+1
    jins_b = np.clip(j0b + WB - 1, 0, LE - 1)        # enters lane WB-1

    lanes = np.arange(WB)

    def ev_window(j0_row):
        idx = np.clip(j0_row[:, None] + lanes[None, :], 0, LE - 1)
        w = np.stack([ev_mean[idx], ev_valid[idx], ev_cbest[idx]], axis=1)
        inb = (j0_row[:, None] + lanes[None, :] >= 0) & \
              (j0_row[:, None] + lanes[None, :] < LE)
        w[:, 1, :] = np.where(inb, w[:, 1, :], 0.0)
        w[:, 2, :] = np.where(inb, w[:, 2, :], 0.0)
        return w.astype(np.float32)

    evinit_f = ev_window(j0[::T])                    # (NT, NEV, WB)
    start_ds = Dp1p - 1 - np.arange(NT) * T          # backward tile starts
    evinit_b = ev_window(j0b[start_ds])

    dk = np.zeros(NT, dtype=np.int64)
    dk[1:] = tile_k[::T][1:] - tile_k[::T][:-1]
    dkb = np.zeros(NT, dtype=np.int64)
    dkb[1:] = tile_k[start_ds][:-1] - tile_k[start_ds][1:]  # >= 0 right shift
    if dk.max() * 128 > REBASE_MAX or dkb.max() * 128 > REBASE_MAX:
        raise ValueError("tile re-base exceeds REBASE_MAX")

    geom = np.zeros((Dp1p, NGEOM), dtype=np.int32)
    geom[:, G_XOFF] = xoff
    geom[:, G_WIDTH] = width
    geom[:, G_JINS] = jins
    geom[::T, G_DK] = dk
    geom[:, G_JINSB] = jins_b
    geom[start_ds, G_DKB] = dkb
    # per-segment boundary injections: lane-packed problems
    # (ops/packing.py) carry several (start, end) pairs; ordinary
    # problems start at 0 and end at n_diag
    if problem.segments is not None:
        for (_, _, _, d0, dend) in problem.segments:
            geom[d0, G_ISSTART] = 1
            geom[dend, G_ISEND] = 1
    else:
        geom[0, G_ISSTART] = 1
        geom[problem.n_diag, G_ISEND] = 1
    geom_t = geom.reshape(NT, T, NGEOM)

    # per-step event-insert scalars (mean, valid), forward & backward order
    def ev_at(j):
        inb = (j >= 0) & (j < LE)
        jc = np.clip(j, 0, LE - 1)
        return np.stack([ev_mean[jc], np.where(inb, ev_valid[jc], 0.0),
                         np.where(inb, ev_cbest[jc], 0.0)],
                        axis=-1).astype(np.float32)

    evins_f = ev_at(j0).reshape(NT, T, NEV)
    d_of = (Dp1p - 1 - (np.arange(NT)[:, None] * T + np.arange(T)[None, :]))
    evins_b = ev_at(j0b[d_of] + 0).reshape(NT, T, NEV)
    # backward inserts the value entering lane WB-1: index j0b(d) + WB - 1
    evins_b = ev_at((j0b[d_of] + WB - 1)).reshape(NT, T, NEV)
    return (geom_t, refwin.astype(np.float32), evinit_f, evinit_b,
            evins_f, evins_b, base, WB)


def _load_pack(pack_ref):
    b = pl.program_id(0)
    g = lambda i: pack_ref[b, i]
    return dict(
        t_mm=g(T_MM), t_mx=g(T_MX), t_my=g(T_MY), t_xm=g(T_XM),
        t_xx=g(T_XX), t_ym=g(T_YM), t_yy=g(T_YY),
        start_m=g(PACK_START), start_x=g(PACK_START + 1),
        start_y=g(PACK_START + 2),
        end_m=g(PACK_END), end_x=g(PACK_END + 1), end_y=g(PACK_END + 2),
        gapx_e=g(PACK_GAPX))


def _rebase(ring, dk, WB, right: bool):
    """Shift all ring rows' data by 128*dk lanes (left fwd / right bwd)."""
    outs = []
    for k in range(REBASE_MAX // 128 + 1):
        s = 128 * k
        if right:
            outs.append(ring[:, RBASE - s:RBASE - s + WB])
        else:
            outs.append(ring[:, RBASE + s:RBASE + s + WB])
    out = outs[0]
    for k in range(1, len(outs)):
        out = jnp.where(dk == k, outs[k], out)
    ring[:, RBASE:RBASE + WB] = out


def _ring_row(ring, slot, state, shift, WB):
    r = slot * 3 + state
    return ring[pl.ds(r, 1), RBASE + shift:RBASE + shift + WB]


def _ring_store(ring, slot, state, WB, val):
    r = slot * 3 + state
    ring[pl.ds(r, 1), RBASE:RBASE + WB] = val


def _fwd_kernel(geom_ref, refwin_ref, evinit_ref, evins_ref, pack_ref,
                out_f_ref, out_incr_ref, out_lse_ref,
                ring, evw, mprev_ref, *, T: int, WB: int):
    t = pl.program_id(1)
    c = _load_pack(pack_ref)
    d0 = t * T
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WB), 1)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev_ref[0] = jnp.float32(0.0)

    dk = geom_ref[0, 0, 0, G_DK]

    @pl.when(jnp.logical_and(t > 0, dk > 0))
    def _do_rebase():
        _rebase(ring, dk, WB, right=False)

    # fresh event window for this tile (host-gathered; exact at i == 0)
    evw[:, EBASE:EBASE + WB] = evinit_ref[0, 0]

    m_hat = refwin_ref[0, 0, pl.ds(0, 1), 0:WB]
    inv_m = refwin_ref[0, 0, pl.ds(1, 1), 0:WB]
    c_m = refwin_ref[0, 0, pl.ds(2, 1), 0:WB]
    inv_y = refwin_ref[0, 0, pl.ds(3, 1), 0:WB]
    c_y = refwin_ref[0, 0, pl.ds(4, 1), 0:WB]
    kvalid = inv_m > 0.0
    e_gapx = jnp.where(kvalid, c["gapx_e"], NEG)

    def step(i, m_prev, slot, slot1, slot2):
        d = d0 + i
        xoff = geom_ref[0, 0, i, G_XOFF]
        wd = geom_ref[0, 0, i, G_WIDTH]

        # advance the event window (except at tile start, where it's fresh)
        @pl.when(i > 0)
        def _advance():
            pair = evins_ref[0, 0, pl.ds(i, 1), 0:2]    # (1, 2): mean, valid
            mean_s = pair[0, 0]
            valid_s = pair[0, 1]
            sh_mean = evw[pl.ds(0, 1), EBASE - 1:EBASE - 1 + WB]
            sh_val = evw[pl.ds(1, 1), EBASE - 1:EBASE - 1 + WB]
            is0 = lane == 0
            evw[pl.ds(0, 1), EBASE:EBASE + WB] = jnp.where(is0, mean_s, sh_mean)
            evw[pl.ds(1, 1), EBASE:EBASE + WB] = jnp.where(is0, valid_s, sh_val)

        ev_mean = evw[pl.ds(0, 1), EBASE:EBASE + WB]
        ev_ok = evw[pl.ds(1, 1), EBASE:EBASE + WB] > 0.5
        ok = kvalid & ev_ok
        am = (ev_mean - m_hat) * inv_m
        ay = (ev_mean - m_hat) * inv_y
        e_match = jnp.where(ok, c_m - 0.5 * am * am, NEG)
        e_stay = jnp.where(ok, c_y - 0.5 * ay * ay, NEG)

        inband = jnp.logical_and(lane >= xoff, lane < xoff + wd)

        p1_m_lo = _ring_row(ring, slot1, MATCH, -1, WB)
        p1_x_lo = _ring_row(ring, slot1, GAP_X, -1, WB)
        p1_m_up = _ring_row(ring, slot1, MATCH, 0, WB)
        p1_y_up = _ring_row(ring, slot1, GAP_Y, 0, WB)
        p2_m = _ring_row(ring, slot2, MATCH, -1, WB)
        p2_x = _ring_row(ring, slot2, GAP_X, -1, WB)
        p2_y = _ring_row(ring, slot2, GAP_Y, -1, WB)

        gx = jnp.logaddexp(p1_m_lo + c["t_mx"], p1_x_lo + c["t_xx"]) + e_gapx
        mm = (jnp.logaddexp(jnp.logaddexp(p2_m + c["t_mm"], p2_x + c["t_xm"]),
                            p2_y + c["t_ym"]) - m_prev) + e_match
        gy = jnp.logaddexp(p1_m_up + c["t_my"], p1_y_up + c["t_yy"]) + e_stay

        is_init = d == 0
        cell0 = lane == 0
        mm = jnp.where(is_init, jnp.where(cell0, c["start_m"], NEG),
                       jnp.where(inband, mm, NEG))
        gx = jnp.where(is_init, jnp.where(cell0, c["start_x"], NEG),
                       jnp.where(inband, gx, NEG))
        gy = jnp.where(is_init, jnp.where(cell0, c["start_y"], NEG),
                       jnp.where(inband, gy, NEG))

        mx = jnp.maximum(jnp.max(mm), jnp.maximum(jnp.max(gx), jnp.max(gy)))
        m = jnp.where(mx > NEG * 0.5, mx, 0.0)
        mm = jnp.maximum(mm - m, NEG)
        gx = jnp.maximum(gx - m, NEG)
        gy = jnp.maximum(gy - m, NEG)

        _ring_store(ring, slot, MATCH, WB, mm)
        _ring_store(ring, slot, GAP_X, WB, gx)
        _ring_store(ring, slot, GAP_Y, WB, gy)

        out_f_ref[0, pl.ds(i, 1), :] = mm
        lse = jnp.log(jnp.sum(jnp.exp(mm + c["end_m"]))
                      + jnp.sum(jnp.exp(gx + c["end_x"]))
                      + jnp.sum(jnp.exp(gy + c["end_y"])))
        out_incr_ref[0, pl.ds(i, 1), :] = jnp.reshape(m, (1, 1))
        out_lse_ref[0, pl.ds(i, 1), :] = jnp.reshape(lse, (1, 1))
        return m

    # T % 3 == 0 so d = t*T + i has d % 3 == i % 3: ring slots are STATIC
    # per unrolled position (dynamic sublane indexing is slow in Mosaic).
    def step3(j, m_prev):
        i = j * 3
        m = step(i, m_prev, 0, 2, 1)
        m = step(i + 1, m, 1, 0, 2)
        m = step(i + 2, m, 2, 1, 0)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev_ref[0])
    mprev_ref[0] = m_final


def _bwd_kernel(geom_ref, refwin_ref, evinit_ref, evins_ref, pack_ref,
                fstack_ref,
                out_b_ref, out_incr_ref, out_lse_ref,
                ring, evw, mprev_ref, *, T: int, WB: int, Dpad: int,
                fuse_post: bool):
    t = pl.program_id(1)
    c = _load_pack(pack_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WB), 1)
    d_start = Dpad - t * T

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev_ref[0] = jnp.float32(0.0)

    dkb = geom_ref[0, 0, T - 1, G_DKB]

    @pl.when(jnp.logical_and(t > 0, dkb > 0))
    def _do_rebase():
        _rebase(ring, dkb, WB, right=True)

    evw[:, EBASE:EBASE + WB] = evinit_ref[0, 0]

    m_hat0 = refwin_ref[0, 0, pl.ds(0, 1), 0:WB]
    inv_m0 = refwin_ref[0, 0, pl.ds(1, 1), 0:WB]
    inv_y0 = refwin_ref[0, 0, pl.ds(3, 1), 0:WB]
    c_y0 = refwin_ref[0, 0, pl.ds(4, 1), 0:WB]
    m_hat1 = refwin_ref[0, 0, pl.ds(0, 1), 1:WB + 1]
    inv_m1 = refwin_ref[0, 0, pl.ds(1, 1), 1:WB + 1]
    c_m1 = refwin_ref[0, 0, pl.ds(2, 1), 1:WB + 1]
    gapx_ok = jnp.where(inv_m1 > 0.0, c["gapx_e"], NEG)

    def step(i, m_prev, slot, slot1, slot2):
        d = d_start - i
        row = T - 1 - i   # row of d within its (forward-order) tile block
        xoff = geom_ref[0, 0, row, G_XOFF]
        wd = geom_ref[0, 0, row, G_WIDTH]
        is_end = geom_ref[0, 0, row, G_ISEND] == 1

        # event window shifts left as d decreases (y+1 grows with lane)
        @pl.when(i > 0)
        def _advance():
            pair = evins_ref[0, 0, pl.ds(i, 1), 0:2]
            mean_s = pair[0, 0]
            valid_s = pair[0, 1]
            sh_mean = evw[pl.ds(0, 1), EBASE + 1:EBASE + 1 + WB]
            sh_val = evw[pl.ds(1, 1), EBASE + 1:EBASE + 1 + WB]
            isR = lane == WB - 1
            evw[pl.ds(0, 1), EBASE:EBASE + WB] = jnp.where(isR, mean_s, sh_mean)
            evw[pl.ds(1, 1), EBASE:EBASE + WB] = jnp.where(isR, valid_s, sh_val)

        ev_mean = evw[pl.ds(0, 1), EBASE:EBASE + WB]
        ev_ok = evw[pl.ds(1, 1), EBASE:EBASE + WB] > 0.5

        ok1 = (inv_m1 > 0.0) & ev_ok
        am1 = (ev_mean - m_hat1) * inv_m1
        e_match_to = jnp.where(ok1, c_m1 - 0.5 * am1 * am1, NEG)
        ok0 = (inv_m0 > 0.0) & ev_ok
        ay0 = (ev_mean - m_hat0) * inv_y0
        e_stay_same = jnp.where(ok0, c_y0 - 0.5 * ay0 * ay0, NEG)

        b1_y = _ring_row(ring, slot1, GAP_Y, 0, WB)     # (x, y+1)
        b1_x = _ring_row(ring, slot1, GAP_X, 1, WB)     # (x+1, y)
        b2_m = _ring_row(ring, slot2, MATCH, 1, WB)     # (x+1, y+1)

        gx_red = b1_x + gapx_ok
        mm_red = (b2_m - m_prev) + e_match_to
        gy_term = b1_y + e_stay_same

        b_match = jnp.logaddexp(jnp.logaddexp(gx_red + c["t_mx"],
                                              mm_red + c["t_mm"]),
                                gy_term + c["t_my"])
        b_gapx = jnp.logaddexp(gx_red + c["t_xx"], mm_red + c["t_xm"])
        b_gapy = jnp.logaddexp(mm_red + c["t_ym"], gy_term + c["t_yy"])

        inband = jnp.logical_and(lane >= xoff, lane < xoff + wd)
        bm = jnp.where(inband, jnp.where(is_end, c["end_m"], b_match), NEG)
        bx = jnp.where(inband, jnp.where(is_end, c["end_x"], b_gapx), NEG)
        by = jnp.where(inband, jnp.where(is_end, c["end_y"], b_gapy), NEG)

        mx = jnp.maximum(jnp.max(bm), jnp.maximum(jnp.max(bx), jnp.max(by)))
        m = jnp.where(is_end, 0.0, jnp.where(mx > NEG * 0.5, mx, 0.0))
        bm = jnp.maximum(bm - m, NEG)
        bx = jnp.maximum(bx - m, NEG)
        by = jnp.maximum(by - m, NEG)

        _ring_store(ring, slot, MATCH, WB, bm)
        _ring_store(ring, slot, GAP_X, WB, bx)
        _ring_store(ring, slot, GAP_Y, WB, by)

        if fuse_post:
            # emit unnormalized log posterior f_match + b_match; the XLA
            # phase only adds the per-diagonal offset and exponentiates
            out_b_ref[0, pl.ds(T - 1 - i, 1), :] = (
                bm + fstack_ref[0, pl.ds(T - 1 - i, 1), :])
        else:
            out_b_ref[0, pl.ds(T - 1 - i, 1), :] = bm
        lse = jnp.log(jnp.sum(jnp.exp(bm + c["start_m"]))
                      + jnp.sum(jnp.exp(bx + c["start_x"]))
                      + jnp.sum(jnp.exp(by + c["start_y"])))
        out_incr_ref[0, pl.ds(T - 1 - i, 1), :] = jnp.reshape(m, (1, 1))
        out_lse_ref[0, pl.ds(T - 1 - i, 1), :] = jnp.reshape(lse, (1, 1))
        return m

    # d = d_start - i with d_start % 3 == 2 (Dp1p % 3 == 0, T % 3 == 0):
    # i % 3 == 0 -> slot 2, 1 -> slot 1, 2 -> slot 0; slot1=(d+1)%3,
    # slot2=(d+2)%3.
    def step3(j, m_prev):
        i = j * 3
        m = step(i, m_prev, 2, 0, 1)
        m = step(i + 1, m, 1, 2, 0)
        m = step(i + 2, m, 0, 1, 2)
        return m

    m_final = jax.lax.fori_loop(0, T // 3, step3, mprev_ref[0])
    mprev_ref[0] = m_final


def _common_specs(NT, T, WB, fwd: bool):
    if fwd:
        geommap = lambda b, t: (b, t, 0, 0)
        refmap = lambda b, t: (b, t, 0, 0)
    else:
        # backward grid tile t covers the diagonals of forward tile NT-1-t
        geommap = lambda b, t: (b, NT - 1 - t, 0, 0)
        refmap = lambda b, t: (b, NT - 1 - t, 0, 0)
    evmap = lambda b, t: (b, t, 0, 0)       # evinit/evins are in grid order
    outmap3 = geommap if fwd else (lambda b, t: (b, NT - 1 - t, 0))
    if fwd:
        outmap3 = lambda b, t: (b, t, 0)
    in_specs = [
        pl.BlockSpec((1, 1, T, NGEOM), geommap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NREF, WB + 2), refmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, NEV, WB), evmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T, 2), evmap, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # pack, whole (B, NPACK)
    ]
    out_specs = (
        pl.BlockSpec((1, T, WB), outmap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, 1), outmap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, 1), outmap3, memory_space=pltpu.VMEM),
    )
    return in_specs, out_specs


@functools.partial(jax.jit, static_argnames=("WB", "T", "interpret"))
def pallas_forward(geom, refwin, evinit, evins, pack, *, WB: int, T: int,
                   interpret: bool = False):
    B, NT, T_, _ = geom.shape
    assert T % 24 == 0, "T must be divisible by 3 (slots) and 8 (tiling)"
    Dp1p = NT * T
    in_specs, out_specs = _common_specs(NT, T, WB, fwd=True)
    out_shapes = (
        jax.ShapeDtypeStruct((B, Dp1p, WB), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1p, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1p, 1), jnp.float32),
    )
    ringw = 8 + REBASE_MAX + WB + REBASE_MAX + 8
    fstack, incr, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, WB=WB),
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((9, ringw), jnp.float32),
                        pltpu.VMEM((NEV, 8 + WB + 8), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(geom, refwin, evinit, evins, pack)
    return fstack, incr[..., 0], lse[..., 0]


@functools.partial(jax.jit,
                   static_argnames=("WB", "T", "interpret", "fuse_post"))
def pallas_backward(geom, refwin, evinit, evins, pack, fstack=None, *,
                    WB: int, T: int, interpret: bool = False,
                    fuse_post: bool = False):
    B, NT, T_, _ = geom.shape
    assert T % 24 == 0, "T must be divisible by 3 (slots) and 8 (tiling)"
    Dp1p = NT * T
    Dpad = Dp1p - 1
    in_specs, out_specs = _common_specs(NT, T, WB, fwd=False)
    if fstack is None:
        fstack = jnp.zeros((B, 8, WB), jnp.float32)
        in_specs = in_specs + [
            pl.BlockSpec((1, 8, WB), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM)]
    else:
        in_specs = in_specs + [
            pl.BlockSpec((1, T, WB), lambda b, t: (b, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM)]
    out_shapes = (
        jax.ShapeDtypeStruct((B, Dp1p, WB), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1p, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1p, 1), jnp.float32),
    )
    ringw = 8 + REBASE_MAX + WB + REBASE_MAX + 8
    bstack, incr, lse = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, WB=WB, Dpad=Dpad,
                          fuse_post=fuse_post),
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((9, ringw), jnp.float32),
                        pltpu.VMEM((NEV, 8 + WB + 8), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(geom, refwin, evinit, evins, pack, fstack)
    return bstack, incr[..., 0], lse[..., 0]


@functools.partial(jax.jit, static_argnames=("WB",))
def _posterior_xframe(fstack, bstack, cvec, xoff, width, base, n_diag,
                      lY, *, WB: int):
    """Posterior match probs over x-frame stacks (XLA, unrestricted)."""
    B, Dp1p, _ = fstack.shape
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    lanes = jnp.arange(WB, dtype=jnp.int32)[None, None, :]
    xs = base[:, :, None].astype(jnp.int32) + lanes
    ys = d_idx - xs
    mask = ((lanes >= xoff[:, :, None]) &
            (lanes < xoff[:, :, None] + width[:, :, None]) &
            (xs > 0) & (ys > 0) &
            (d_idx <= n_diag[:, None, None]))
    logp = fstack + bstack + cvec[:, :, None]
    post = jnp.exp(jnp.maximum(logp, NEG))
    return jnp.minimum(jnp.where(mask, post, 0.0), 1.0)


K_LANE = 16  # per-diagonal lane-level top-k (level-1 compaction)


@functools.partial(jax.jit, static_argnames=("T", "reverse"))
def _tile_offsets(incr, *, T: int, reverse: bool):
    # Within-tile prefix sums (f32, small magnitudes => accurate) and
    # per-tile totals; the host does the tiny float64 inter-tile prefix.
    B, Dp1p = incr.shape
    tiles = incr.reshape(B, Dp1p // T, T)
    if reverse:
        intra = jnp.cumsum(tiles[:, :, ::-1], axis=2)[:, :, ::-1]
    else:
        intra = jnp.cumsum(tiles, axis=2)
    sums = jnp.sum(tiles, axis=2)
    return intra.reshape(B, Dp1p), sums


@jax.jit
def _post_from_fused(postlog, cvec, xoffs, widths, base, n_diag):
    B, Dp1p, WB = postlog.shape
    d_idx = jnp.arange(Dp1p, dtype=jnp.int32)[None, :, None]
    lanes = jnp.arange(WB, dtype=jnp.int32)[None, None, :]
    xs = base[:, :, None] + lanes
    ys = d_idx - xs
    mask = ((lanes >= xoffs[:, :, None]) &
            (lanes < xoffs[:, :, None] + widths[:, :, None]) &
            (xs > 0) & (ys > 0) & (d_idx <= n_diag[:, None, None]))
    post = jnp.exp(jnp.maximum(postlog + cvec[:, :, None], NEG))
    return jnp.minimum(jnp.where(mask, post, 0.0), 1.0)


@functools.partial(jax.jit, static_argnames=("K",))
def _compact_two_level(post, K: int):
    """Two-level top-k: per-diagonal lane top-K_LANE, then global top-K.

    Dominates the naive flat top-k (tens of millions of elements) because
    level 1 is a cheap per-row reduction; K_LANE bounds pairs per diagonal
    (reference behavior: ~0.5 above-threshold pairs per diagonal on real
    reads, hard output bound 3x events overall).
    """
    B, Dp1p, WB = post.shape
    v1, l1 = jax.lax.top_k(post, K_LANE)                # (B, Dp1p, K_LANE)
    flat = v1.reshape(B, -1)
    v2, i2 = jax.lax.top_k(flat, K)                     # (B, K)
    d2 = i2 // K_LANE
    lane2 = jnp.take_along_axis(l1.reshape(B, -1), i2, axis=1)
    return v2, d2, lane2


class PallasAligner:
    """Persistent-device-array batch runner for the Pallas kernels.

    Prep (host gathers + upload) happens once in the constructor; execute()
    runs the sweeps/posterior/compaction. P=1, MODE_MEAN_ONLY.
    """

    def __init__(self, problems: Sequence[bfb.BandedProblem], W: int,
                 T: int = 240, interpret: bool = False):
        assert all(p.mode == bfb.MODE_MEAN_ONLY for p in problems)
        self.problems = list(problems)
        self.W = W
        self.T = T
        self.interpret = interpret
        B = len(problems)

        geoms, refwins, evfs, evbs = [], [], [], []
        evinss_f, evinss_b, packs, bases = [], [], [], []
        WB = None
        for p in problems:
            g, rw, ef, eb, eif, eib, base, WB = tile_geometry(p, W, T)
            geoms.append(g)
            refwins.append(rw)
            evfs.append(ef)
            evbs.append(eb)
            evinss_f.append(eif)
            evinss_b.append(eib)
            bases.append(base)
            pk = np.zeros(NPACK, dtype=np.float32)
            pk[PACK_TRANS:PACK_TRANS + 9] = p.log_trans
            pk[PACK_START:PACK_START + 3] = p.start_logs
            pk[PACK_END:PACK_END + 3] = p.end_logs
            pk[PACK_GAPX] = bfb.LOG_GAPX_EMISSION
            packs.append(pk)

        self.WB = WB
        self.geom = jnp.asarray(np.stack(geoms))
        self.refwin = jnp.asarray(np.stack(refwins))
        self.evinit_f = jnp.asarray(np.stack(evfs))
        self.evinit_b = jnp.asarray(np.stack(evbs))
        self.evins_f = jnp.asarray(np.stack(evinss_f))
        self.evins_b = jnp.asarray(np.stack(evinss_b))
        self.pack = jnp.asarray(np.stack(packs))
        geom_h = np.stack(geoms).reshape(B, -1, NGEOM)
        self.xoffs = jnp.asarray(geom_h[:, :, G_XOFF].astype(np.int32))
        self.widths = jnp.asarray(geom_h[:, :, G_WIDTH].astype(np.int32))
        self.base_h = np.stack(bases)
        self.base_a = jnp.asarray(self.base_h.astype(np.int32))
        self.Ds = np.array([p.n_diag for p in problems])
        self.lYs = jnp.asarray(np.array([p.lY for p in problems],
                                        dtype=np.int32))

    def execute(self, compact_k: int = 0, threshold: float = 0.01,
                as_arrays: bool = False) -> List[Dict]:
        B = len(self.problems)
        WB, T = self.WB, self.T
        fstack, f_incr, f_lse = pallas_forward(
            self.geom, self.refwin, self.evinit_f, self.evins_f, self.pack,
            WB=WB, T=T, interpret=self.interpret)
        postlog, b_incr, b_lse = pallas_backward(
            self.geom, self.refwin, self.evinit_b, self.evins_b, self.pack,
            fstack, WB=WB, T=T, interpret=self.interpret, fuse_post=True)

        fintra, fsums = _tile_offsets(f_incr, T=T, reverse=False)
        bintra, bsums = _tile_offsets(b_incr, T=T, reverse=True)
        fsums_h = np.asarray(fsums, dtype=np.float64)
        bsums_h = np.asarray(bsums, dtype=np.float64)
        fbase = np.concatenate([np.zeros((B, 1)),
                                np.cumsum(fsums_h, axis=1)[:, :-1]], axis=1)
        bbase = np.concatenate([np.cumsum(bsums_h[:, ::-1],
                                          axis=1)[:, ::-1][:, 1:],
                                np.zeros((B, 1))], axis=1)
        tD = self.Ds // T
        f_lse_h = np.asarray(f_lse, dtype=np.float64)
        b_lse_h = np.asarray(b_lse, dtype=np.float64)
        fintraD = np.asarray(
            jnp.take_along_axis(fintra, jnp.asarray(self.Ds[:, None]),
                                axis=1)[:, 0], dtype=np.float64)
        total_f = (f_lse_h[np.arange(B), self.Ds]
                   + fbase[np.arange(B), tD] + fintraD)
        total_b = b_lse_h[:, 0] + bbase[:, 0] + np.asarray(
            bintra[:, 0:1], dtype=np.float64)[:, 0]

        # per-tile combined constant keeps every device-side addend small
        c_tile = (fbase + bbase - total_f[:, None]).astype(np.float32)
        cvec = fintra + bintra + jnp.repeat(jnp.asarray(c_tile), T, axis=1)
        post = _post_from_fused(postlog, cvec, self.xoffs, self.widths,
                                self.base_a,
                                jnp.asarray(self.Ds.astype(np.int32)))

        results: List[Dict] = []
        if compact_k > 0:
            vals, ds, lanes = _compact_two_level(post, K=compact_k)
            vals_h = np.asarray(vals)
            ds_h = np.asarray(ds)
            lanes_h = np.asarray(lanes)
            for i, p in enumerate(self.problems):
                arrs = _decode_arrays(p, vals_h[i], ds_h[i], lanes_h[i],
                                      self.base_h[i], threshold)
                entry = {"total_f": float(total_f[i]),
                         "total_b": float(total_b[i])}
                if as_arrays:
                    entry["pairs_arrays"] = arrs
                else:
                    entry["pairs"] = _pairs_from_arrays(p, arrs)
                results.append(entry)
        else:
            post_h = np.asarray(post)
            for i, p in enumerate(self.problems):
                results.append({"post_x": post_h[i], "base": self.base_h[i],
                                "total_f": float(total_f[i]),
                                "total_b": float(total_b[i])})
        return results


def _decode_arrays(problem, vals, ds, lanes, base, threshold):
    # Vectorized decode: (prob_int, x, y) arrays sorted by diagonal.
    keep = vals >= threshold
    vals = vals[keep]
    ds_k = ds[keep]
    lanes_k = lanes[keep]
    x = base[ds_k] + lanes_k
    y = ds_k - x
    ok = (x > 0) & (y > 0) & (x <= problem.lX) & (y <= problem.lY)
    x = x[ok] - 1
    y = y[ok] - 1
    prob = (np.minimum(vals[ok], 1.0) * 10000000).astype(np.int64)
    order = np.lexsort((x, x + y))
    return prob[order], x[order], y[order]


def _pairs_from_arrays(problem, arrs):
    prob, x, y = arrs
    seq = problem.seq
    k = problem.kmer_len
    if problem.path_kmers is None:
        return [(int(p), int(xi), int(yi), seq[xi:xi + k])
                for p, xi, yi in zip(prob, x, y)]
    return [(int(p), int(xi), int(yi), problem.path_kmers[xi][0])
            for p, xi, yi in zip(prob, x, y)]


def _decode_levels(problem, vals, ds, lanes, base, threshold):
    keep = vals >= threshold
    out = []
    for v, d, l in zip(vals[keep], ds[keep], lanes[keep]):
        x = int(base[d]) + int(l)
        y = int(d) - x
        if x <= 0 or y <= 0 or x > problem.lX or y > problem.lY:
            continue
        kmer = problem.path_kmer_at(x, 0)
        if kmer is None:
            continue
        out.append((int(min(float(v), 1.0) * 10000000), x - 1, y - 1, kmer))
    out.sort(key=lambda r: (r[1] + r[2], r[1]))
    return out


def run_banded_fb_pallas(problems: Sequence[bfb.BandedProblem], W: int,
                         T: int = 240, compact_k: int = 0,
                         threshold: float = 0.01,
                         interpret: bool = False) -> List[Dict]:
    """One-shot convenience wrapper around PallasAligner."""
    return PallasAligner(problems, W, T, interpret).execute(
        compact_k=compact_k, threshold=threshold)


def _decode_xframe(problem, vals, idx, base, WB, threshold):
    keep = vals >= threshold
    vals = vals[keep]
    idx = idx[keep]
    ds = idx // WB
    ls = idx % WB
    out = []
    for v, d, l in zip(vals, ds, ls):
        x = int(base[d]) + int(l)
        y = int(d) - x
        if x <= 0 or y <= 0 or x > problem.lX or y > problem.lY:
            continue
        kmer = problem.path_kmer_at(x, 0)
        if kmer is None:
            continue
        out.append((int(min(float(v), 1.0) * 10000000), x - 1, y - 1, kmer))
    out.sort(key=lambda r: (r[1] + r[2], r[1]))
    return out


def tile_leg_windows(problem: bfb.BandedProblem, W: int, T: int,
                     path: int, PP: int):
    """Per-tile additive legality mask planes for the paths-in-lanes P>1
    kernels (lane = read * PP + path).

    legal[p_to, q_from, x] (prepare_problem, path_checkLegal semantics)
    is pre-gathered into the tile x-frame: plane j encodes the path
    offset delta = j - (PP - 1), i.e. source path q = p - delta for the
    forward reduce over sources into target path ``path`` at x = tb + u,
    and target path p = q + delta for the backward reduce over targets
    from source path ``path`` at x = tb + u + 1. 0.0 = legal,
    NEG = illegal (additive in the log-domain logsumexp).
    """
    Dp1 = problem.x0.shape[0]
    Dp1p = ((Dp1 + T - 1) // T) * T
    NT = Dp1p // T
    WB = W + T + 128
    NLEG = 2 * PP - 1
    legal = problem.legal                       # (P, P, LXpad) bool
    Pav = legal.shape[0]
    LX = legal.shape[2]

    x0 = np.zeros(Dp1p, dtype=np.int64)
    x0[:Dp1] = problem.x0
    x0[Dp1:] = x0[Dp1 - 1]
    tb = (x0[np.arange(NT) * T] // 128) * 128   # (NT,)
    u = np.arange(WB)
    xs = tb[:, None] + u[None, :]               # (NT, WB) target x (fwd)
    xs1 = xs + 1                                # target x for backward
    inb = (xs >= 0) & (xs < LX)
    inb1 = (xs1 >= 0) & (xs1 < LX)
    xc = np.clip(xs, 0, LX - 1)
    xc1 = np.clip(xs1, 0, LX - 1)

    legf = np.full((NLEG, NT, WB), bfb.NEG, dtype=np.float32)
    legb = np.full((NLEG, NT, WB), bfb.NEG, dtype=np.float32)
    for j in range(NLEG):
        delta = j - (PP - 1)
        q = path - delta                        # fwd source path
        if 0 <= path < Pav and 0 <= q < Pav:
            ok = legal[path, q][xc] & inb
            legf[j][ok] = 0.0
        p_to = path + delta                     # bwd target path
        if 0 <= path < Pav and 0 <= p_to < Pav:
            ok = legal[p_to, path][xc1] & inb1
            legb[j][ok] = 0.0
    return legf, legb
