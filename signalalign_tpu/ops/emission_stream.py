"""Device-side emission streams for the lane-batched Pallas DP kernels.

The lane kernels compute Gaussian (MODE_MEAN_ONLY) emissions inline; any
other emission model is fed as a *stream*: an XLA precompute evaluates
the per-cell log-emissions into an HBM stack (G, Dp1p, WBe, S) that the
DP kernels DMA one diagonal row at a time — the same pattern the
backward kernel already uses for the forward match rows. This keeps the
hot kernels emission-model agnostic and puts the gather-heavy spline
evaluation (unsupported inside Mosaic) in XLA, where it runs once per
sweep pair off the critical path.

First (and flagship) producer: the HDP spline density used for
methylation calling — log((1/var) * hdp_spline(descaled mean)), stay
emission == match emission (reference: stateMachine.c:527
emissions_signal_getHdpKmerDensity, stateMachine3HDP_cellCalculate;
re-stated in banded_fb._emissions_at MODE_HDP).

Layout notes (mirrors banded_fb_pallas.tile_geometry's x-frame):
  * sublane u of tile tt covers absolute kmer index x = base(tt) + u,
    constant within the tile;
  * the event consumed at diagonal d, sublane u is j(d, u) = lY - d +
    fp + base(tt(d)) + u (forward orientation);
  * rows carry WBe = WB + 8 sublanes so the backward kernel can read
    the x+1-shifted row without a separate stream;
  * the backward kernel's first two steps of each tile consume rows
    belonging to the neighboring tile's frame; those are materialized
    separately (``ebnd``), re-based, so the kernel needs no boundary
    special-casing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from signalalign_tpu.ops import banded_fb as bfb

NEG = bfb.NEG


def _spline_eval_fused_kernel(evw_ref, aw_ref, ivw_ref, rowd_ref,
                              rowsl_ref, out_ref, *, NG: int, TT: int,
                              TSHIFT: int):
    """Fused spline-argument + evaluation kernel: builds each row's
    grid-unit argument in-register from the per-tile event window (the
    XLA per-diagonal dynamic-slice formulation of txs cost ~35ms/stripe
    in fusion overhead alone).

    evw: (WLp, S) sentinel-encoded event stream in grid units' source
         (invalid events = 1e35); row i, sublane-block w reads
         evw[TSHIFT - i + 8w : +8].
    aw/ivw: (8, S) per-sublane affine params, pre-divided by dx and
         grid-shifted (invalid positions: aw = 4e30, ivw = 0) so
         txs = aw + ivw * ev directly; sentinel >= 1e29 marks invalid.
    rowd/rowsl: (NG, 8, S) density / dx- and 1/var-prescaled slope rows.
    out: (TT, 8, S) log-density.
    """
    w8 = pl.program_id(1) * 8
    aw = aw_ref[0]
    ivw = ivw_ref[0]
    rows = []
    for i in range(TT):
        ev = evw_ref[0, pl.ds(TSHIFT - i + w8, 8), :]
        rows.append(aw + ivw * ev)
    txs = jnp.stack(rows, axis=0)                    # (TT, 8, S)
    out_ref[0] = _spline_interp_core(txs, rowd_ref[0], rowsl_ref[0],
                                     NG=NG)


def _spline_eval_banked_kernel(evw_ref, aw_ref, ivw_ref, masks_ref,
                               slotb_ref, cnt_ref, rowdx_ref, rowsx_ref,
                               out_ref, scrd, scrs, sems, *, NG: int,
                               TT: int, TSHIFT: int, MAXB: int):
    """Banked-table variant of the fused spline kernel: the per-tile
    density/slope windows are DMAd from the HBM x-form tables inside
    the kernel instead of being gather-materialized by XLA (the window
    materialization was ~80% of the whole methylation pipeline). Frame
    bases are 128-aligned per lane, so each (tile, 8-sublane block)
    touches only the few DISTINCT bases ("banks") across lanes: DMA
    each bank's (NG, 8, S) block once, then select per lane with the
    precomputed bank masks (sum-of-masked: masks partition lanes).

    One launch covers every tile: grid (G, NT, WBe//8); per-tile
    inputs ride block specs. rowdx/rowsx: (G, LXB8, NG, 8, S)
    ANY-space x-form tables (block b8 covers absolute x =
    8*b8 + [0..8)); masks: per-tile (MAXB, 8, S) lane masks per bank
    slot (0 rows for unused slots); slotb/cnt: (MAXB|1, 8, 128) i32 —
    bank block bases (tb // 8) and the used-slot count.
    """
    g = pl.program_id(0)
    w8b = pl.program_id(2)
    cnt = cnt_ref[0, 0, 0, 0, 0]
    for b in range(MAXB):
        @pl.when(b < cnt)
        def _start(b=b):
            blk = slotb_ref[0, 0, b, 0, 0] + w8b
            pltpu.make_async_copy(rowdx_ref.at[g, blk], scrd.at[b],
                                  sems.at[2 * b]).start()
            pltpu.make_async_copy(rowsx_ref.at[g, blk], scrs.at[b],
                                  sems.at[2 * b + 1]).start()
    w8 = w8b * 8
    aw = aw_ref[0, 0]
    ivw = ivw_ref[0, 0]
    rows = []
    for i in range(TT):
        ev = evw_ref[0, 0, pl.ds(TSHIFT - i + w8, 8), :]
        rows.append(aw + ivw * ev)
    txs = jnp.stack(rows, axis=0)                    # (TT, 8, S)
    for b in range(MAXB):
        @pl.when(b < cnt)
        def _wait(b=b):
            blk = slotb_ref[0, 0, b, 0, 0] + w8b
            pltpu.make_async_copy(rowdx_ref.at[g, blk], scrd.at[b],
                                  sems.at[2 * b]).wait()
            pltpu.make_async_copy(rowsx_ref.at[g, blk], scrs.at[b],
                                  sems.at[2 * b + 1]).wait()

        @pl.when(b >= cnt)
        def _zero(b=b):
            scrd[b] = jnp.zeros(scrd.shape[1:], scrd.dtype)
            scrs[b] = jnp.zeros(scrs.shape[1:], scrs.dtype)
    # per-lane table select: masks partition lanes across bank slots
    tabd = masks_ref[0, 0, 0][None] * scrd[0]
    tabs = masks_ref[0, 0, 0][None] * scrs[0]
    for b in range(1, MAXB):
        m = masks_ref[0, 0, b][None]
        tabd = tabd + m * scrd[b]
        tabs = tabs + m * scrs[b]
    out_ref[0, 0] = _spline_interp_core(txs, tabd, tabs, NG=NG)


def _spline_interp_core(txs, tabd, tabs, *, NG: int):
    """Shared Hermite interpolation over grouped table rows."""
    valid = txs < 1e29
    tc = jnp.clip(txs, -2.0, float(NG) + 2.0)
    il = jnp.clip(jnp.floor(tc), 0.0, float(NG - 2))
    zero = jnp.zeros(txs.shape, jnp.float32)
    GSEL = 8
    il4 = jnp.floor(il * (1.0 / GSEL))
    NJ = (NG - 2) // GSEL + 1
    accd = [zero] * (GSEL + 1)
    accs = [zero] * (GSEL + 1)
    for j in range(NJ):
        m = (il4 == float(j)).astype(jnp.float32)
        for r in range(GSEL + 1):
            g = min(GSEL * j + r, NG - 1)
            accd[r] = accd[r] + m * tabd[g]
            accs[r] = accs[r] + m * tabs[g]
    b = il - il4 * float(GSEL)

    def tree(acc, lo, hi):
        if hi - lo == 1:
            return acc[lo]
        mid = (lo + hi) // 2
        return jnp.where(b < float(mid) - 0.5,
                         tree(acc, lo, mid), tree(acc, mid, hi))

    yl = tree(accd, 0, GSEL)
    sl = tree(accs, 0, GSEL)
    yr = tree(accd[1:], 0, GSEL)
    sr = tree(accs[1:], 0, GSEL)
    dy = yr - yl
    a = sl - dy
    bb = dy - sr
    tl = tc - il
    tr = 1.0 - tl
    mid = tr * yl + tl * yr + tl * tr * (a * tr + bb * tl)
    y0 = tabd[0]
    s0 = tabs[0]
    yN = tabd[NG - 1]
    sN = tabs[NG - 1]
    below = y0 + s0 * txs
    above = yN + sN * (txs - float(NG - 1))
    v = jnp.where(txs <= 0.0, below,
                  jnp.where(txs >= float(NG - 1), above, mid))
    v = jnp.maximum(v, 0.0)
    return jnp.where(valid & (v > 0.0),
                     jnp.log(jnp.maximum(v, 1e-37)), NEG)


def _spline_eval_banked(evw, aw, ivw, masks, slotb, cnt, rowdx, rowsx,
                        *, TT: int, TSHIFT: int, MAXB: int,
                        interpret: bool = False):
    """ONE launch over every tile. evw (G, NT, WLp, S);
    aw/ivw (G, NT, WBe, S); masks (G, NT, MAXB, 8, S);
    slotb (G, NT, MAXB, 8, 128) i32; cnt (G, NT, 1, 8, 128) i32;
    rowdx/rowsx (G, LXB8, NG, 8, S) -> (G, NT, TT, WBe, S)."""
    G, NT, WLp, S = evw.shape
    WBe = aw.shape[2]
    NG = rowdx.shape[2]
    WBu = 8
    return pl.pallas_call(
        functools.partial(_spline_eval_banked_kernel, NG=NG, TT=TT,
                          TSHIFT=TSHIFT, MAXB=MAXB),
        grid=(G, NT, WBe // WBu),
        in_specs=[
            pl.BlockSpec((1, 1, WLp, S), lambda g, t, w: (g, t, 0, 0)),
            pl.BlockSpec((1, 1, WBu, S), lambda g, t, w: (g, t, w, 0)),
            pl.BlockSpec((1, 1, WBu, S), lambda g, t, w: (g, t, w, 0)),
            pl.BlockSpec((1, 1, MAXB, 8, S),
                         lambda g, t, w: (g, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, MAXB, 8, 128),
                         lambda g, t, w: (g, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, 8, 128),
                         lambda g, t, w: (g, t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, TT, WBu, S),
                               lambda g, t, w: (g, t, 0, w, 0)),
        out_shape=jax.ShapeDtypeStruct((G, NT, TT, WBe, S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((MAXB, NG, WBu, S), jnp.float32),
            pltpu.VMEM((MAXB, NG, WBu, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * MAXB,)),
        ],
        interpret=interpret,
    )(evw, aw, ivw, masks, slotb, cnt, rowdx, rowsx)


def _spline_eval_fused(evw, aw, ivw, rowd, rowsl, *, TT: int,
                       TSHIFT: int, interpret: bool = False):
    """evw (G, WLp, S); aw/ivw (G, WBe, S); rowd/rowsl (G, NG, WBe, S)
    -> (G, TT, WBe, S) log-densities."""
    G, WLp, S = evw.shape
    WBe = aw.shape[1]
    NG = rowd.shape[1]
    WBu = 8
    return pl.pallas_call(
        functools.partial(_spline_eval_fused_kernel, NG=NG, TT=TT,
                          TSHIFT=TSHIFT),
        grid=(G, WBe // WBu),
        in_specs=[
            pl.BlockSpec((1, WLp, S), lambda g, w: (g, 0, 0)),
            pl.BlockSpec((1, WBu, S), lambda g, w: (g, w, 0)),
            pl.BlockSpec((1, WBu, S), lambda g, w: (g, w, 0)),
            pl.BlockSpec((1, NG, WBu, S), lambda g, w: (g, 0, w, 0)),
            pl.BlockSpec((1, NG, WBu, S), lambda g, w: (g, 0, w, 0)),
        ],
        out_specs=pl.BlockSpec((1, TT, WBu, S), lambda g, w: (g, 0, w, 0)),
        out_shape=jax.ShapeDtypeStruct((G, TT, WBe, S), jnp.float32),
        interpret=interpret,
    )(evw, aw, ivw, rowd, rowsl)


@functools.partial(jax.jit,
                   static_argnames=("T", "WBe", "maxb", "interpret"))
def hdp_emission_stacks(kmerw, aw, ivw, evm, evv, j0d, kidx, ivx, basex,
                        bmask, bslot, bcnt, dens, slopes, grid,
                        *, T: int, WBe: int, maxb: int = 0,
                        interpret: bool = False):
    """HDP log-emission stream + backward tile-boundary rows.

    kmerw/aw/ivw: (G, NT, WBe, S) per-tile kmer table rows and the
        affine spline-argument params for x = base + u: the descaled
        argument is a(u) + iv(u)*event with a = mu - m_hat/var and
        iv = 1/var (per POSITION, so lane-packed segments from different
        reads carry their own scaling; kmer < 0 marks invalid cells).
        The 1/var density prefactor rides the gathered table rows
        (iv * spline is exact under linear interpolation), replacing the
        former per-lane log-var subtraction.
    evm/evv:  (G, LE, S) per-lane padded event means / validity.
    j0d:      (G, Dp1p, S) i32 — event index entering sublane 0 of each
        diagonal (lY - d + fp + base), unclipped.
    Returns (estack (G, Dp1p, WBe, S) f32, ebnd (G, NT, 2, WBe, S) f32).

    The two re-based boundary rows the backward kernel consumes at the
    top of block t are diagonals d_start+1+r evaluated in the frame of
    the tile OWNING d_start = Dp1p-1-t*T — i.e. rows i = T+r of tile
    NT-1-t in its own frame. Each tile therefore evaluates T+2 rows and
    the last two become ``ebnd`` (a per-cell gather formulation of the
    boundary rows measured 200ms/stripe; this costs 2/T extra kernel
    rows).
    """
    G, NT, WBe_, S = kmerw.shape
    Dp1p = NT * T
    g0 = grid[0]
    dx = grid[1]
    LE = evm.shape[1]

    # Main stream: the naive per-cell formulation (10 random gathers per
    # cell over the flat (K*NG) tables + per-cell event gathers) is
    # gather-bound on TPU — measured 9.4s per 128-lane stripe vs ~0.08s
    # for the DP sweeps it feeds. The evaluation has structure the
    # gathers ignore:
    #   * the kmer (so the spline ROW) is constant per (tile, sublane):
    #     gather dens/slopes ROWS once per tile (WBe*S row gathers);
    #   * the event index is affine in the diagonal (j = A + u - i):
    #     per lane ONE contiguous (WBe + T + 1) slice of the event
    #     array covers the whole tile incl. boundary rows; per-diagonal
    #     rows are shifted static views of it;
    #   * only the NG-wide minor-axis interpolation lookup stays
    #     per-cell (the unrolled Pallas kernel).
    # generous pads: dynamic_slice CLAMPS out-of-range starts, which
    # would silently misalign the window against the jwin mask
    # (A can run ~W negative past the read end); out-of-band cells
    # are masked below, so pad contents never matter
    FP = T + 1 + 1024
    BP = WBe + 1024
    padded = jnp.pad(evm, ((0, 0), (FP, BP), (0, 0)))
    padv = jnp.pad(evv, ((0, 0), (FP, BP), (0, 0)))
    TE = T + 2     # per-tile rows: T stream diagonals + 2 boundary rows

    NG = dens.shape[1]
    banked = maxb > 0
    # one-shot x-form row gather: per-tile frames OVERLAP, so a
    # per-tile take() would re-gather ~6x the unique (x, lane) rows.
    # Gather each lane's kmer rows ONCE over its x range, prescale,
    # and either (banked) hand the HBM tables to the kernel — which
    # DMAs each (tile, block)'s few distinct 128-aligned frame-base
    # "banks" and selects per lane — or (fallback, >12 banks/tile)
    # materialize per-tile windows with vmapped dynamic slices.
    G_, LXp, S_ = kidx.shape
    rdx = jnp.take(dens, kidx, axis=0) * ivx[..., None]   # (G,LXp,S,NG)
    rsx = jnp.take(slopes, kidx, axis=0) * (ivx * dx)[..., None]
    if banked:
        LXB = ((LXp + WBe + 8 + 127) // 128) * 128
        rdxp = jnp.pad(rdx, ((0, 0), (0, LXB - LXp), (0, 0), (0, 0)))
        rsxp = jnp.pad(rsx, ((0, 0), (0, LXB - LXp), (0, 0), (0, 0)))

        def to_banked(a):
            return jnp.transpose(
                a.reshape(G_, LXB // 8, 8, S_, NG), (0, 1, 4, 2, 3))
        rowdxb = to_banked(rdxp)            # (G, LXB8, NG, 8, S)
        rowsxb = to_banked(rsxp)

        # all-tile event windows + spline-arg params in ONE fused pass
        # (the per-tile lax.map paid ~1.5ms of launch overhead per
        # tile, ~half the whole stream)
        WL = WBe + T + 1
        WLp = ((WL + 7) // 8) * 8
        A = j0d[:, ::T]                              # (G, NT, S)
        start = A - (T + 1)

        def lane_slice(e, s0):
            return jax.lax.dynamic_slice(e, (s0,), (WL,))
        sl3 = jax.vmap(jax.vmap(jax.vmap(lane_slice, in_axes=(1, 0),
                                         out_axes=1),
                                in_axes=(None, 0)),
                       in_axes=(0, 0))
        evwall = sl3(padded, start + FP)             # (G, NT, WL, S)
        evvall = sl3(padv, start + FP)
        jw = (start[:, :, None, :]
              + jnp.arange(WL, dtype=jnp.int32)[None, None, :, None])
        okw = (evvall > 0.5) & (jw >= 0) & (jw < LE)
        evsall = jnp.where(okw, evwall, 1e35)
        evsall = jnp.pad(evsall, ((0, 0), (0, 0), (0, WLp - WL), (0, 0)),
                         constant_values=1e35)
        validu = kmerw >= 0                          # (G, NT, WBe, S)
        awg_all = jnp.where(validu, (aw - g0) / dx, 4e30)
        ivg_all = jnp.where(validu, ivw / dx, 0.0)
        est = _spline_eval_banked(
            evsall, awg_all, ivg_all, bmask, bslot, bcnt,
            rowdxb, rowsxb, TT=TE, TSHIFT=T + 1, MAXB=maxb,
            interpret=interpret)                     # (G, NT, TE, WBe, S)
        estack = est[:, :, :T].reshape(G, Dp1p, WBe, S)
        ebnd = est[:, ::-1, T:]                      # (G, NT, 2, WBe, S)
        return estack, ebnd
    else:
        rowdx = jnp.pad(jnp.moveaxis(rdx, -1, 1),
                        ((0, 0), (0, 0), (0, WBe + 8), (0, 0)))
        rowsx = jnp.pad(jnp.moveaxis(rsx, -1, 1),
                        ((0, 0), (0, 0), (0, WBe + 8), (0, 0)))

        def _win_lane(a, s0):           # a (NG, LXp+WBe+8) one (g, s)
            return jax.lax.dynamic_slice(a, (0, s0), (NG, WBe))
        _win = jax.vmap(jax.vmap(_win_lane, in_axes=(2, 0), out_axes=2),
                        in_axes=(0, 0))

    def tile_fast(tt):
        kw = kmerw[:, tt]                                   # (G, WBe, S)
        a_ = aw[:, tt]
        iv = ivw[:, tt]
        if not banked:
            rowd_t = _win(rowdx, basex[:, tt])       # (G, NG, WBe, S)
            rowsl_t = _win(rowsx, basex[:, tt])
        # per-lane event window: j(i, u) = j0d[tt*T] - i + u spans
        # [A - (T+1), A + WBe - 1], one dynamic slice per lane; rows are
        # built in-kernel (dynamic sublane slices) by the fused kernel
        A = j0d[:, tt * T]                                  # (G, S)
        start = A - (T + 1)
        WL = WBe + T + 1
        WLp = ((WL + 7) // 8) * 8

        def lane_slice(e, s0):
            return jax.lax.dynamic_slice(e, (s0,), (WL,))
        sl2 = jax.vmap(jax.vmap(lane_slice, in_axes=(1, 0), out_axes=1),
                       in_axes=(0, 0))
        evwin = sl2(padded, start + FP)                     # (G, WL, S)
        evvwin = sl2(padv, start + FP)
        jwin = (start[:, None, :]
                + jnp.arange(WL, dtype=jnp.int32)[None, :, None])
        okwin = (evvwin > 0.5) & (jwin >= 0) & (jwin < LE)
        # sentinel encoding folds every mask into the argument stream:
        # invalid events / positions push txs past the 1e29 cutoff
        evs = jnp.where(okwin, evwin, 1e35)
        evs = jnp.pad(evs, ((0, 0), (0, WLp - WL), (0, 0)),
                      constant_values=1e35)
        validu = kw >= 0
        awg = jnp.where(validu, (a_ - g0) / dx, 4e30)
        ivg = jnp.where(validu, iv / dx, 0.0)
        if banked:
            return _spline_eval_banked(
                evs, awg, ivg, bmask[:, tt], bslot[:, tt], bcnt[:, tt],
                rowdxb, rowsxb, TT=TE, TSHIFT=T + 1, MAXB=maxb,
                interpret=interpret)
        return _spline_eval_fused(evs, awg, ivg, rowd_t, rowsl_t,
                                  TT=TE, TSHIFT=T + 1,
                                  interpret=interpret)

    est = jax.lax.map(tile_fast, jnp.arange(NT))         # (NT, G, TE, ...)
    estack = jnp.moveaxis(est[:, :, :T], 0, 1).reshape(G, Dp1p, WBe, S)
    # ebnd[g, t] = rows (T, T+1) of tile NT-1-t (backward block order)
    ebnd = jnp.moveaxis(est[::-1, :, T:], 0, 1)          # (G, NT, 2, ...)
    return estack, ebnd


def host_stream_inputs(problem: bfb.BandedProblem, W: int, T: int,
                       path: int, WBe: int, LEmax: int):
    """Per-lane host arrays for ``hdp_emission_stacks``.

    Returns (kmerw (NT, WBe), aw, ivw, evm (LEmax,), evv (LEmax,),
    j0d (Dp1p,)).

    Reference geometry: banded_fb_pallas.tile_geometry (x-frame).
    """
    Dp1 = problem.x0.shape[0]
    Dp1p = ((Dp1 + T - 1) // T) * T
    NT = Dp1p // T
    lY = problem.lY
    fp = problem.ev_front_pad

    x0 = np.zeros(Dp1p, dtype=np.int64)
    x0[:Dp1] = problem.x0
    x0[Dp1:] = x0[Dp1 - 1]
    tb = (x0[np.arange(NT) * T] // 128) * 128            # (NT,)

    kmer_ids = problem.kmer_ids
    pslot = min(path, kmer_ids.shape[0] - 1)
    kids = kmer_ids[pslot].astype(np.int64)              # (LXpad,)
    if path >= kmer_ids.shape[0]:
        kids = np.full_like(kids, -1)
    LX = kids.shape[0]
    mu = problem.ref_params[7, min(path, problem.ref_params.shape[1] - 1)]
    m_hat = problem.ref_params[0,
                               min(path, problem.ref_params.shape[1] - 1)]
    # invalid path slots carry zeroed params; mark via inv_m == 0
    inv_m = problem.ref_params[1,
                               min(path, problem.ref_params.shape[1] - 1)]
    # per-POSITION 1/var (lane-packed segments carry their own read
    # scaling; uniform otherwise). The spline argument is a + iv*event
    # with a = mu - m_hat*iv; the 1/var density prefactor scales the
    # gathered table rows device-side.
    if problem.ivar_by_x is not None:
        iv_x = np.asarray(problem.ivar_by_x, dtype=np.float64)[:LX]
    else:
        iv_x = np.full(LX, 1.0 / max(float(problem.var), 1e-30))
    a_x = mu - m_hat * iv_x

    u = np.arange(WBe)

    def window(frame_base):
        xs = frame_base[:, None] + u[None, :]
        oob = (xs < 0) | (xs >= LX)
        xc = np.clip(xs, 0, LX - 1)
        kw = kids[xc].copy()
        kw[oob] = -1
        kw[inv_m[xc] <= 0.0] = -1
        if path >= kmer_ids.shape[0]:
            kw[:] = -1
        return (kw.astype(np.int32), a_x[xc].astype(np.float32),
                iv_x[xc].astype(np.float32))

    kmerw, aw, ivw = window(tb)

    # x-form tables for the device-side one-shot row gather (the
    # per-tile formulation re-gathered every overlapping frame window;
    # see hdp_emission_stacks): kmer id per absolute x (invalid -> 0,
    # masked later by the aw/ivw sentinels) + per-x 1/var + per-tile
    # frame bases
    kx = np.maximum(kids, 0).astype(np.int32)
    kx[inv_m[:LX] <= 0.0] = 0
    ivx = iv_x.astype(np.float32)

    d = np.arange(Dp1p)
    base_d = tb[d // T]
    j0d = (lY - d + fp + base_d).astype(np.int32)

    # backward-order tile blocks: program t consumes d_start = Dp1p-1-t*T
    # and needs rows d_start+1, d_start+2 in tile(d_start)'s frame —
    # those are rows i = T, T+1 of tile NT-1-t, which the device stream
    # evaluates alongside the tile's own diagonals (no extra inputs).

    evm = np.zeros(LEmax, dtype=np.float32)
    evv = np.zeros(LEmax, dtype=np.float32)
    LE = problem.ev_params.shape[1]
    evm[:LE] = problem.ev_params[0]
    evv[:LE] = problem.ev_params[3]
    return (kmerw, aw, ivw, evm, evv, j0d, kx, ivx,
            tb.astype(np.int32))
