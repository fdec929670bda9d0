"""Lane packing: time-multiplex several short segments into one DP lane.

The lane-batched kernels sweep every lane of a stripe over the same
Dp1p diagonals; a stripe mixing 300- and 1700-diagonal segments wastes
most of its short lanes on padding (measured: the bundled methylation
workload fills ~37% of its stripes). ``pack_problems`` concatenates
segments end-to-end along the diagonal axis of ONE BandedProblem:

  * segment i+1's cell (0, 0) is placed at global (ox, oy) with
    ox = prev_ox + prev_lX + 2 and oy = prev_oy + prev_lY, so its start
    diagonal d0 = prev_end + 2 and the band advances exactly one cell
    per diagonal through the two-diagonal glue (x-frame feasible);
  * the glue diagonal carries width 0 (all cells dead), and the x gap
    of 2 guarantees no transition can reach across segments (match and
    gapX read x-1; the nearest live source is 2 cells away);
  * the forward kernel re-injects start mass at each segment's d0 (the
    G_ISSTART geometry plane); the backward kernel already injects end
    weights per (diagonal, lane) via G_ISEND;
  * per-diagonal rescale offsets telescope per segment, so per-segment
    totals and the per-diagonal posterior normalizer are recovered by
    the segment-aware scans (_totals_cvec_df_seg) from the same
    incr/lse streams.

Exactness: paths cannot cross segment boundaries and each segment's
start/end injections replicate its standalone boundary conditions, so
the packed DP factorizes — every cell's posterior and each segment's
forward/backward total equal the standalone run's to f32 roundoff.

The reference has no analogue (one signalMachine process per read,
impl/signalMachine.c); this is the TPU-native answer to its process
pool: dense lanes instead of more processes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from signalalign_tpu.ops import banded_fb as bfb


def can_pack(problems: Sequence[bfb.BandedProblem]) -> bool:
    """Packable: same mode/alphabet/path-count shape and identical
    transition/start/end scalars (per-read scaling lives in the per-x
    parameter tables; ``var`` differences are carried per-x)."""
    p0 = problems[0]
    for p in problems[1:]:
        if (p.mode != p0.mode or p.kmer_len != p0.kmer_len
                or p.num_kmers != p0.num_kmers
                or p.kmer_ids.shape[0] != p0.kmer_ids.shape[0]
                or not np.array_equal(p.log_trans, p0.log_trans)
                or not np.array_equal(p.start_logs, p0.start_logs)
                or not np.array_equal(p.end_logs, p0.end_logs)):
            return False
        if p.mode == bfb.MODE_HDP and (
                p.hdp_dens is not p0.hdp_dens
                and not np.array_equal(p.hdp_dens, p0.hdp_dens)):
            return False
    return True


def pack_group(problems: Sequence[bfb.BandedProblem],
               Dpad: int) -> bfb.BandedProblem:
    """Concatenate segments into one packed BandedProblem (see module
    docstring for the layout)."""
    assert problems and can_pack(problems)
    p0 = problems[0]
    P = p0.kmer_ids.shape[0]
    GAP = 2                       # x gap between segments
    lX = sum(p.lX for p in problems) + GAP * (len(problems) - 1)
    lY = sum(p.lY for p in problems)
    n_diag = lX + lY
    if n_diag > Dpad:
        raise ValueError(f"packed diagonals {n_diag} exceed Dpad={Dpad}")
    # W headroom: reuse p0's LXpad margin (same W for every bucket member)
    W_margin = p0.kmer_ids.shape[1] - (p0.lX + 1)
    LXpad = lX + 1 + W_margin
    LEpad = lY + p0.ev_front_pad + W_margin + 4

    x0 = np.zeros(Dpad + 1, dtype=np.int32)
    width = np.zeros(Dpad + 1, dtype=np.int32)
    ref_params = np.zeros((p0.ref_params.shape[0], P, LXpad),
                          dtype=p0.ref_params.dtype)
    kmer_ids = np.zeros((P, LXpad), dtype=np.int32)
    path_valid = np.zeros((P, LXpad), dtype=bool)
    legal = np.zeros((P, P, LXpad), dtype=bool)
    n_paths = np.zeros(LXpad, dtype=np.int32)
    n_paths[0] = 1
    ivar_by_x = np.full(LXpad, 1.0 / max(float(p0.var), 1e-30),
                        dtype=np.float64)
    ev_params = np.zeros((bfb.NEVP, LEpad), dtype=p0.ev_params.dtype)
    means = np.zeros(lY, dtype=np.float64)
    noises = np.ones(lY, dtype=np.float64)
    path_kmers: Optional[list] = [] if any(
        p.path_kmers is not None for p in problems) else None
    seq_parts: List[str] = []

    segs = []
    ox = oy = 0
    for si, p in enumerate(problems):
        d0 = ox + oy
        dend = d0 + p.n_diag
        segs.append((p, ox, oy, d0, dend))
        # band: offset by (ox, d0); glue diagonal before d0 gets the
        # width-0 pinch at x = ox - 1 (advances one cell per diagonal)
        D = p.n_diag
        x0[d0:d0 + D + 1] = p.x0[:D + 1] + ox
        width[d0:d0 + D + 1] = p.width[:D + 1]
        if si + 1 < len(problems):
            x0[dend + 1] = ox + p.lX + 1
            width[dend + 1] = 0
        # per-x tables at x in [ox+1, ox+lX]
        sl = slice(ox + 1, ox + p.lX + 1)
        ref_params[:, :, sl] = p.ref_params[:, :, 1:p.lX + 1]
        kmer_ids[:, sl] = p.kmer_ids[:, 1:p.lX + 1]
        path_valid[:, sl] = p.path_valid[:, 1:p.lX + 1]
        n_paths[sl] = p.n_paths[1:p.lX + 1]
        legal[:, :, sl] = p.legal[:, :, 1:p.lX + 1]
        if si:
            # a fresh segment start: only transitions from the (dead)
            # boundary are nominally legal; the x gap keeps them unread
            legal[:, :, ox + 1] = p.legal[:, :, 1]
        ivar_by_x[sl] = 1.0 / max(float(p.var), 1e-30)
        if path_kmers is not None:
            if si:
                path_kmers.extend([[]] * GAP)
            pk = (p.path_kmers if p.path_kmers is not None
                  else [[p.seq[i:i + p.kmer_len]] for i in range(p.lX)])
            path_kmers.extend(pk)
        seq_parts.append(p.seq)
        # events: global y in (oy, oy + lY]
        pm = p.ev_params[0, p.ev_front_pad:p.ev_front_pad + p.lY][::-1]
        pn = p.ev_params[1, p.ev_front_pad:p.ev_front_pad + p.lY][::-1]
        means[oy:oy + p.lY] = pm
        noises[oy:oy + p.lY] = pn
        ox += p.lX + GAP
        oy += p.lY
    x0[n_diag + 1:] = x0[n_diag]

    fp = p0.ev_front_pad
    rev = slice(fp, fp + lY)
    ev_params[0, rev] = means[::-1]
    ev_params[1, rev] = noises[::-1]
    with np.errstate(divide="ignore"):
        ev_params[2, rev] = np.log(noises[::-1])
    ev_params[3, rev] = 1.0

    ev_best = None
    ev_norm_total = 0.0
    return dataclasses.replace(
        p0,
        lX=lX, lY=lY, n_diag=n_diag,
        var=float(p0.var),
        x0=x0, width=width,
        ref_params=ref_params, kmer_ids=kmer_ids, path_valid=path_valid,
        legal=legal, n_paths=n_paths,
        ev_params=ev_params, ev_best=ev_best, ev_norm_total=ev_norm_total,
        seq="".join(seq_parts), path_kmers=path_kmers,
        segments=segs, ivar_by_x=ivar_by_x)


def pack_problems(problems: Sequence[bfb.BandedProblem], d_target: int,
                  same_read_keys: Optional[Sequence] = None,
                  ) -> Tuple[List[bfb.BandedProblem], List[List[int]]]:
    """First-fit-decreasing bin packing of segments into lanes of at
    most ``d_target`` diagonals. Returns (packed problems, groups) where
    groups[i] lists the original problem indices inside packed[i], in
    segment order. ``same_read_keys`` restricts co-packing to equal keys
    (EM expectation lanes: per-lane 1/var must be uniform for the
    Gaussian moment accumulator)."""
    order = sorted(range(len(problems)),
                   key=lambda i: -problems[i].n_diag)
    bins: List[List[int]] = []
    fill: List[int] = []
    keys: List = []
    for i in order:
        nd = problems[i].n_diag + 2
        key = same_read_keys[i] if same_read_keys is not None else None
        placed = False
        for b in range(len(bins)):
            if fill[b] + nd <= d_target and keys[b] == key \
                    and can_pack([problems[bins[b][0]], problems[i]]):
                bins[b].append(i)
                fill[b] += nd
                placed = True
                break
        if not placed:
            bins.append([i])
            fill.append(nd)
            keys.append(key)
    # uniform Dpad across the stripe: singleton groups re-pad through
    # pack_group too (the lane kernels stack per-problem arrays, so
    # every lane's diagonal axis must have the same padded length)
    packed = [pack_group([problems[i] for i in group], Dpad=d_target)
              for group in bins]
    return packed, bins
