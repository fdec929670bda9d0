"""Fused Pallas TPU wavefront kernels for the banded forward-backward.

The XLA lax.scan implementation (banded_fb.py) issues ~40 small kernels per
anti-diagonal; at 2x65k diagonals per read batch the per-op dispatch alone
costs seconds. These Pallas kernels run a whole sweep tile (T diagonals)
inside one kernel invocation with the DP carries resident in VMEM scratch,
so per-diagonal cost is pure VPU compute.

Layout per problem (P=1 canonical path, MODE_MEAN_ONLY emissions):
  * ref parameter rows (NPAR, LXpad) and reversed event rows (NEVP, LEpad)
    live whole in VMEM (a few hundred KB);
  * per-diagonal integer geometry (x0, width, shifts, event slice starts)
    is a (Dpad+1, NGEOM) int32 VMEM table, read scalar-wise in the loop;
  * the diagonal ring buffer is a (9 = 3 diagonals x 3 states, 3W+pad)
    VMEM scratch whose side columns stay NEG forever, so neighbor windows
    are plain dynamic slices;
  * outputs (normalized match-state band rows, offset increments, end/start
    dots) stream to HBM in (T, W) blocks via the grid.

Grid: (B, NT) with NT = (Dpad+1)/T; the diagonal axis iterates innermost so
scratch carries persist across tiles of the same problem.

reference semantics: identical to banded_fb._banded_sweeps_core (itself
validated against the float64 oracle and the upstream golden TSVs).
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
G_X0, G_WIDTH, G_SHIFT1, G_SHIFT2, G_EVF, G_U1, G_U2, G_EVB = range(8)
PACK_TRANS = 0
PACK_START = 9
PACK_END = 12
PACK_GAPX = 15
NPACK = 16
END_MARK = 7  # G_U1 value (impossible shift) marking the final diagonal


def _clamp_shift(sh: np.ndarray, W: int) -> np.ndarray:
    out = sh.copy()
    out[np.abs(out) > W] = -(W + 2)
    return out


def prepare_pallas_arrays(problem: bfb.BandedProblem, W: int):
    """Host-side geometry/scalar packing for the Pallas kernels."""
    Dp1 = problem.x0.shape[0]
    x0 = problem.x0.astype(np.int64)
    width = problem.width.astype(np.int64)
    lY = problem.lY
    fp = problem.ev_front_pad
    d = np.arange(Dp1)

    shift1 = np.zeros(Dp1, dtype=np.int64)
    shift2 = np.zeros(Dp1, dtype=np.int64)
    shift1[1:] = x0[1:] - x0[:-1] - 1
    shift2[2:] = x0[2:] - x0[:-2] - 1
    shift1[0] = W + 2  # unused (d=0 is the init diagonal)
    shift2[:2] = W + 2

    u1 = np.full(Dp1, W + 2, dtype=np.int64)
    u2 = np.full(Dp1, W + 2, dtype=np.int64)
    u1[:-1] = x0[:-1] - x0[1:]
    u2[:-2] = x0[:-2] + 1 - x0[2:]

    ev_f = lY - d + x0 + fp
    ev_b = ev_f - 1

    LE = problem.ev_params.shape[-1]
    LX = problem.ref_params.shape[-1]
    geom = np.zeros((Dp1, NGEOM), dtype=np.int32)
    geom[:, G_X0] = np.clip(x0, 0, max(LX - W - 1, 0))
    geom[:, G_WIDTH] = width
    geom[:, G_SHIFT1] = _clamp_shift(shift1, W)
    geom[:, G_SHIFT2] = _clamp_shift(shift2, W)
    geom[:, G_EVF] = np.clip(ev_f, 0, LE - W)
    geom[:, G_U1] = _clamp_shift(u1, W)
    geom[:, G_U2] = _clamp_shift(u2, W)
    geom[:, G_EVB] = np.clip(ev_b, 0, LE - W)
    # mark the final diagonal for the backward kernel (end-distribution
    # init); W+7 is outside the legal shift range.
    geom[problem.n_diag, G_U1] = W + END_MARK

    pack = np.zeros(NPACK, dtype=np.float32)
    pack[PACK_TRANS:PACK_TRANS + 9] = problem.log_trans
    pack[PACK_START:PACK_START + 3] = problem.start_logs
    pack[PACK_END:PACK_END + 3] = problem.end_logs
    pack[PACK_GAPX] = bfb.LOG_GAPX_EMISSION
    return geom, pack


def _row(ref, r, start, W):
    """(1, W) window of row r starting at column ``start``."""
    return ref[0, pl.ds(r, 1), pl.ds(start, W)]


def _ring_read(ring, slot, state, start, W):
    return ring[pl.ds(slot * 3 + state, 1), pl.ds(start, W)]


def _ring_write(ring, slot, state, base, W, val):
    ring[pl.ds(slot * 3 + state, 1), pl.ds(base, W)] = val


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


def _fwd_kernel(geom_ref, ref_ref, ev_ref, pack_ref,
                out_f_ref, out_incr_ref, out_lse_ref,
                ring, mprev_ref, *, T: int, W: int):
    t = pl.program_id(1)
    base = W + 8
    c = _load_pack(pack_ref)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev_ref[0] = jnp.float32(0.0)

    oidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def step(i, m_prev):
        d = t * T + i
        x0 = geom_ref[0, d, G_X0]
        wd = geom_ref[0, d, G_WIDTH]
        sh1 = geom_ref[0, d, G_SHIFT1]
        sh2 = geom_ref[0, d, G_SHIFT2]
        evs = geom_ref[0, d, G_EVF]
        slot = jax.lax.rem(d, 3)
        slot1 = jax.lax.rem(d + 2, 3)
        slot2 = jax.lax.rem(d + 1, 3)

        def emit_cur():
            m_hat = _row(ref_ref, 0, x0, W)
            inv_m = _row(ref_ref, 1, x0, W)
            c_m = _row(ref_ref, 2, x0, W)
            inv_y = _row(ref_ref, 3, x0, W)
            c_y = _row(ref_ref, 4, x0, W)
            ev_mean = _row(ev_ref, 0, evs, W)
            ev_valid = _row(ev_ref, 3, evs, W) > 0.5
            kvalid = inv_m > 0.0
            am = (ev_mean - m_hat) * inv_m
            ay = (ev_mean - m_hat) * inv_y
            ok = kvalid & ev_valid
            e_match = jnp.where(ok, c_m - 0.5 * am * am, NEG)
            e_stay = jnp.where(ok, c_y - 0.5 * ay * ay, NEG)
            e_gapx = jnp.where(kvalid, c["gapx_e"], NEG)

            s1 = sh1 + base
            s2 = sh2 + base
            p1_m_lo = _ring_read(ring, slot1, MATCH, s1, W)
            p1_x_lo = _ring_read(ring, slot1, GAP_X, s1, W)
            p1_m_up = _ring_read(ring, slot1, MATCH, s1 + 1, W)
            p1_y_up = _ring_read(ring, slot1, GAP_Y, s1 + 1, W)
            p2_m = _ring_read(ring, slot2, MATCH, s2, W)
            p2_x = _ring_read(ring, slot2, GAP_X, s2, W)
            p2_y = _ring_read(ring, slot2, GAP_Y, s2, W)

            gx = jnp.logaddexp(p1_m_lo + c["t_mx"], p1_x_lo + c["t_xx"]) + e_gapx
            mm = (jnp.logaddexp(jnp.logaddexp(p2_m + c["t_mm"],
                                              p2_x + c["t_xm"]),
                                p2_y + c["t_ym"]) - m_prev) + e_match
            gy = jnp.logaddexp(p1_m_up + c["t_my"], p1_y_up + c["t_yy"]) + e_stay
            inband = oidx < wd
            return (jnp.where(inband, mm, NEG), jnp.where(inband, gx, NEG),
                    jnp.where(inband, gy, NEG))

        def init_cur():
            cell = oidx == 0
            return (jnp.where(cell, c["start_m"], NEG),
                    jnp.where(cell, c["start_x"], NEG),
                    jnp.where(cell, c["start_y"], NEG))

        mm, gx, gy = jax.lax.cond(d == 0, init_cur, emit_cur)

        mx = jnp.maximum(jnp.max(mm), jnp.maximum(jnp.max(gx), jnp.max(gy)))
        m = jnp.where(mx > NEG * 0.5, mx, 0.0)
        mm = jnp.maximum(mm - m, NEG)
        gx = jnp.maximum(gx - m, NEG)
        gy = jnp.maximum(gy - m, NEG)

        _ring_write(ring, slot, MATCH, base, W, mm)
        _ring_write(ring, slot, GAP_X, base, W, gx)
        _ring_write(ring, slot, GAP_Y, base, W, gy)

        out_f_ref[0, pl.ds(i, 1), :] = mm
        lse = jnp.log(jnp.sum(jnp.exp(mm + c["end_m"]))
                      + jnp.sum(jnp.exp(gx + c["end_x"]))
                      + jnp.sum(jnp.exp(gy + c["end_y"])))
        out_incr_ref[0, pl.ds(i, 1), :] = jnp.reshape(m, (1, 1))
        out_lse_ref[0, pl.ds(i, 1), :] = jnp.reshape(lse, (1, 1))
        return m

    m_final = jax.lax.fori_loop(0, T, step, mprev_ref[0])
    mprev_ref[0] = m_final


def _bwd_kernel(geom_ref, ref_ref, ev_ref, pack_ref,
                out_b_ref, out_incr_ref, out_lse_ref,
                ring, mprev_ref, *, T: int, W: int, Dpad: int):
    t = pl.program_id(1)
    base = W + 8
    c = _load_pack(pack_ref)

    @pl.when(t == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, NEG, dtype=ring.dtype)
        mprev_ref[0] = jnp.float32(0.0)

    oidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def step(i, m_prev):
        d = Dpad - (t * T + i)
        x0 = geom_ref[0, d, G_X0]
        wd = geom_ref[0, d, G_WIDTH]
        u1 = geom_ref[0, d, G_U1]
        u2 = geom_ref[0, d, G_U2]
        evb = geom_ref[0, d, G_EVB]
        is_end = u1 == W + END_MARK
        u1c = jnp.where(is_end, W + 2, u1)
        slot = jax.lax.rem(d, 3)
        slot1 = jax.lax.rem(d + 1, 3)
        slot2 = jax.lax.rem(d + 2, 3)

        m_hat1 = _row(ref_ref, 0, x0 + 1, W)
        inv_m1 = _row(ref_ref, 1, x0 + 1, W)
        c_m1 = _row(ref_ref, 2, x0 + 1, W)
        m_hat0 = _row(ref_ref, 0, x0, W)
        inv_m0 = _row(ref_ref, 1, x0, W)
        inv_y0 = _row(ref_ref, 3, x0, W)
        c_y0 = _row(ref_ref, 4, x0, W)
        ev_mean = _row(ev_ref, 0, evb, W)
        ev_valid = _row(ev_ref, 3, evb, W) > 0.5

        ok1 = (inv_m1 > 0.0) & ev_valid
        am1 = (ev_mean - m_hat1) * inv_m1
        e_match_to = jnp.where(ok1, c_m1 - 0.5 * am1 * am1, NEG)
        ok0 = (inv_m0 > 0.0) & ev_valid
        ay0 = (ev_mean - m_hat0) * inv_y0
        e_stay_same = jnp.where(ok0, c_y0 - 0.5 * ay0 * ay0, NEG)
        gapx_ok = jnp.where(inv_m1 > 0.0, c["gapx_e"], NEG)

        s1 = u1c + base
        s2 = u2 + base
        b1_y = _ring_read(ring, slot1, GAP_Y, s1, W)
        b1_x = _ring_read(ring, slot1, GAP_X, s1 + 1, W)
        b2_m = _ring_read(ring, slot2, MATCH, s2, W)

        gx_red = b1_x + gapx_ok
        mm_red = (b2_m - m_prev) + e_match_to
        gy_term = b1_y + e_stay_same

        b_match = jnp.logaddexp(jnp.logaddexp(gx_red + c["t_mx"],
                                              mm_red + c["t_mm"]),
                                gy_term + c["t_my"])
        b_gapx = jnp.logaddexp(gx_red + c["t_xx"], mm_red + c["t_xm"])
        b_gapy = jnp.logaddexp(mm_red + c["t_ym"], gy_term + c["t_yy"])

        inband = oidx < wd
        bm = jnp.where(inband, jnp.where(is_end, c["end_m"], b_match), NEG)
        bx = jnp.where(inband, jnp.where(is_end, c["end_x"], b_gapx), NEG)
        by = jnp.where(inband, jnp.where(is_end, c["end_y"], b_gapy), NEG)

        mx = jnp.maximum(jnp.max(bm), jnp.maximum(jnp.max(bx), jnp.max(by)))
        m = jnp.where(is_end, 0.0, jnp.where(mx > NEG * 0.5, mx, 0.0))
        bm = jnp.maximum(bm - m, NEG)
        bx = jnp.maximum(bx - m, NEG)
        by = jnp.maximum(by - m, NEG)

        _ring_write(ring, slot, MATCH, base, W, bm)
        _ring_write(ring, slot, GAP_X, base, W, bx)
        _ring_write(ring, slot, GAP_Y, base, W, by)

        out_b_ref[0, pl.ds(T - 1 - i, 1), :] = bm
        lse = jnp.log(jnp.sum(jnp.exp(bm + c["start_m"]))
                      + jnp.sum(jnp.exp(bx + c["start_x"]))
                      + jnp.sum(jnp.exp(by + c["start_y"])))
        out_incr_ref[0, pl.ds(T - 1 - i, 1), :] = jnp.reshape(m, (1, 1))
        out_lse_ref[0, pl.ds(T - 1 - i, 1), :] = jnp.reshape(lse, (1, 1))
        return m

    m_final = jax.lax.fori_loop(0, T, step, mprev_ref[0])
    mprev_ref[0] = m_final


def _specs(Dp1, LX, LE, T, W):
    in_specs = [
        pl.BlockSpec((1, Dp1, NGEOM), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bfb.NPAR, LX), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bfb.NEVP, LE), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pack: whole (B, NPACK)
    ]
    return in_specs


@functools.partial(jax.jit, static_argnames=("W", "T", "interpret"))
def pallas_forward(geom, ref_params, ev_params, pack, *, W: int, T: int,
                   interpret: bool = False):
    B, Dp1, _ = geom.shape
    NT = Dp1 // T
    assert NT * T == Dp1, "Dpad+1 must be divisible by T"
    LX = ref_params.shape[-1]
    LE = ev_params.shape[-1]
    SW = 3 * W + 16

    out_shapes = (
        jax.ShapeDtypeStruct((B, Dp1, W), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1, 1), jnp.float32),
    )
    fstack, incr, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, W=W),
        grid=(B, NT),
        in_specs=_specs(Dp1, LX, LE, T, W),
        out_specs=(
            pl.BlockSpec((1, T, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((9, SW), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(geom, ref_params, ev_params, pack)
    return fstack, incr[..., 0], lse[..., 0]


@functools.partial(jax.jit, static_argnames=("W", "T", "interpret"))
def pallas_backward(geom, ref_params, ev_params, pack, *, W: int, T: int,
                    interpret: bool = False):
    B, Dp1, _ = geom.shape
    NT = Dp1 // T
    assert NT * T == Dp1
    LX = ref_params.shape[-1]
    LE = ev_params.shape[-1]
    SW = 3 * W + 16
    Dpad = Dp1 - 1

    out_shapes = (
        jax.ShapeDtypeStruct((B, Dp1, W), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Dp1, 1), jnp.float32),
    )
    bstack, incr, lse = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, W=W, Dpad=Dpad),
        grid=(B, NT),
        in_specs=_specs(Dp1, LX, LE, T, W),
        out_specs=(
            pl.BlockSpec((1, T, W), lambda b, t: (b, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, t: (b, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b, t: (b, NT - 1 - t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((9, SW), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(geom, ref_params, ev_params, pack)
    return bstack, incr[..., 0], lse[..., 0]


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[-1] == size:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, size - arr.shape[-1])]
    return np.pad(arr, pad)


def run_banded_fb_pallas(problems: Sequence[bfb.BandedProblem], W: int,
                         T: int = 256, compact_k: int = 0,
                         threshold: float = 0.01,
                         interpret: bool = False) -> List[Dict]:
    """Pallas-path batch runner (P=1, MODE_MEAN_ONLY only)."""
    assert all(p.mode == bfb.MODE_MEAN_ONLY for p in problems)
    B = len(problems)
    Dp1 = problems[0].x0.shape[0]
    assert all(p.x0.shape[0] == Dp1 for p in problems)
    Dp1p = ((Dp1 + T - 1) // T) * T  # pad diagonals to a whole tile count
    LX = max(p.ref_params.shape[-1] for p in problems)
    LE = max(p.ev_params.shape[-1] for p in problems)

    geoms, packs, refs, evs = [], [], [], []
    for p in problems:
        g, pk = prepare_pallas_arrays(p, W)
        if Dp1p > Dp1:
            padrow = g[-1:].copy()
            padrow[:, G_WIDTH] = 0
            padrow[:, G_SHIFT1] = -(W + 2)
            padrow[:, G_SHIFT2] = -(W + 2)
            padrow[:, G_U1] = -(W + 2)
            padrow[:, G_U2] = -(W + 2)
            g = np.concatenate([g, np.repeat(padrow, Dp1p - Dp1, axis=0)])
        geoms.append(g)
        packs.append(pk)
        refs.append(_pad_to(p.ref_params[:, 0, :], LX))
        evs.append(_pad_to(p.ev_params, LE))
    Dp1 = Dp1p

    geom = jnp.asarray(np.stack(geoms))
    ref = jnp.asarray(np.stack(refs))
    ev = jnp.asarray(np.stack(evs))
    pack = jnp.asarray(np.stack(packs))

    fstack, f_incr, f_lse = pallas_forward(geom, ref, ev, pack, W=W, T=T,
                                           interpret=interpret)
    bstack, b_incr, b_lse = pallas_backward(geom, ref, ev, pack, W=W, T=T,
                                            interpret=interpret)

    f_incr_h = np.asarray(f_incr, dtype=np.float64)
    b_incr_h = np.asarray(b_incr, dtype=np.float64)
    Ds = np.array([p.n_diag for p in problems])
    fo = np.cumsum(f_incr_h, axis=1)
    bo = np.cumsum(b_incr_h[:, ::-1], axis=1)[:, ::-1]
    f_lse_h = np.asarray(f_lse, dtype=np.float64)
    b_lse_h = np.asarray(b_lse, dtype=np.float64)
    total_f = f_lse_h[np.arange(B), Ds] + fo[np.arange(B), Ds]
    total_b = b_lse_h[:, 0] + bo[:, 0]

    cvec = (fo + bo - total_f[:, None]).astype(np.float32)

    def _padD(a):
        return np.pad(a, (0, Dp1 - a.shape[0]))

    x0s = jnp.asarray(np.stack([_padD(p.x0) for p in problems]))
    widths = jnp.asarray(np.stack([_padD(p.width) for p in problems]))
    post = bfb.posterior_batched(
        fstack[:, :, None, :], bstack[:, :, None, :], jnp.asarray(cvec),
        x0s, widths, jnp.asarray(Ds.astype(np.int32)), W=W, P=1)

    results = []
    if compact_k > 0:
        vals, idx = bfb.compact_posterior_topk(post, K=compact_k)
        vals_h, idx_h = np.asarray(vals), np.asarray(idx)
        for i, p in enumerate(problems):
            pairs = bfb.decode_topk_pairs(p, vals_h[i], idx_h[i], 1, W,
                                          threshold)
            results.append({"pairs": pairs, "total_f": float(total_f[i]),
                            "total_b": float(total_b[i])})
    else:
        post_h = np.asarray(post)
        for i in range(B):
            results.append({"post": post_h[i], "total_f": float(total_f[i]),
                            "total_b": float(total_b[i])})
    return results
